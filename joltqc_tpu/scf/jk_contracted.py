"""Contracted-task J/K engine: device-resident tables + per-class scans.

This is the production Fock builder; the sharded path (mesh=) is the
one exposed by joltqc_tpu/parallel as well.
Design vs the reference driver (/root/reference/jqc/pyscf/jk.py):

 - one compiled kernel per (angular quartet, nprim-bucket quartet, tier):
   a jitted lax.scan whose chunk body gathers shell geometry from small
   per-class device tables by int32 task indices, evaluates the
   contracted ERI block (ops/eri.py), contracts with the density, and
   scatter-accumulates J/K in int32 limbs -> DF64;
 - tasks (= screened shell-quartet index pairs) are built ONCE on host
   (scf/tasks.py) and stay on device for the whole SCF: per iteration the
   only host->device traffic is the density matrix;
 - FP32/DF64 tiers are a static partition by Schwarz bound x global
   density bound (reference: per-task dq routing,
   jk/screen_jk_tasks.cu:258-271); the plan is rebuilt only if the
   density bound outgrows its margin;
 - the 8-fold symmetry is handled by unique weighted tasks + one final
   vj + vj^T (exact power-of-two weights).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from ..mol.layout import BasisLayout
from ..ops import df64 as df
from ..ops.accum import block_accumulate, limbs_to_df64, scatter_limbs
from ..ops.arith import get_arith
from ..ops.eri import contracted_eri_batch
from ..ops.harmonics import cart_components
from .tasks import (
    build_pair_classes,
    build_quartet_tasks,
    build_shell_classes,
    sort_pairs_by_q,
)


def _nf(l):
    return len(cart_components(l))


def _take(tbl, idx):
    # mode="clip": pad tasks index the zero-coef pad shell (the LAST table
    # row).  jnp.take's default mode is "fill" -- NaN for floats, INT_MIN
    # for ints -- which poisons any downstream matmul (0 * NaN = NaN; the
    # tile accumulator's one-hot dots cannot mask it, found as the
    # x64-mode tile parity failure, VERDICT r3 weak #3).
    if isinstance(tbl, df.DF64):
        return df.DF64(
            jnp.take(tbl.hi, idx, axis=0, mode="clip"),
            jnp.take(tbl.lo, idx, axis=0, mode="clip"),
        )
    return jnp.take(tbl, idx, axis=0, mode="clip")


def _contract_blocks(tier, G, aos, nfs, dm, nao, with_j, with_k, off=0):
    """Density contraction of an ERI block batch -> per-stream values.

    G: (T, nfa*nfb, nfc*nfd) (ar-native); aos: (ao_a, ao_b, ao_c, ao_d)
    int32 (T,); nfs: (nfa, nfb, nfc, nfd).  Returns (jstreams, kstreams):
    lists of ("xy", vals2d, idx2d) with vals2d (T, nfx*nfy) contribution
    blocks and idx2d the matching flat nao*nao indices -- J has streams
    ab/cd, K has ac/ad/bc/bd (the 6 output blocks of one quartet's
    8-fold orbit; reference: the six atomicAdd targets of
    jk/1q1t.cu:423-643).

    ``off``: flat element offset of one density in a stacked multi-dm
    batch (dm gathers and output indices both shift by off = d*nao^2);
    the ERI block G is computed once and contracted with every dm
    (reference: the n_dm kernel template arg, backend/jk_1qnt.py)."""
    ar = get_arith(tier)
    isdf = tier in ("df64", "fp64")
    ao_a, ao_b, ao_c, ao_d = aos
    nfa, nfb, nfc, nfd = nfs
    T = ao_a.shape[0]

    def blk_idx(ao_x, nx, ao_y, ny):
        fx = jnp.arange(nx, dtype=jnp.int32)
        fy = jnp.arange(ny, dtype=jnp.int32)
        return (
            (ao_x[:, None, None] + fx[None, :, None]) * nao
            + ao_y[:, None, None]
            + fy[None, None, :]
        ).reshape(T, nx * ny)

    def dm_blk(idx):
        if isdf:
            return df.DF64(
                jnp.take(dm.hi.reshape(-1), idx), jnp.take(dm.lo.reshape(-1), idx)
            )
        return jnp.take(dm.reshape(-1), idx)

    def bmv(mat, vec):
        if isdf:
            out = ar.bmm(mat, df.DF64(vec.hi[..., None], vec.lo[..., None]))
            return df.DF64(out.hi[:, :, 0], out.lo[:, :, 0])
        return ar.bmm(mat, vec[..., None])[:, :, 0]

    def t12(x):
        if isdf:
            return df.DF64(x.hi.transpose(0, 2, 1), x.lo.transpose(0, 2, 1))
        return x.transpose(0, 2, 1)

    def perm(x4, axes, m, n):
        if isdf:
            return df.DF64(
                x4.hi.transpose(axes).reshape(T, m, n),
                x4.lo.transpose(axes).reshape(T, m, n),
            )
        return x4.transpose(axes).reshape(T, m, n)

    idx_ab = blk_idx(ao_a, nfa, ao_b, nfb) + off
    idx_cd = blk_idx(ao_c, nfc, ao_d, nfd) + off

    jstreams, kstreams = [], []
    if with_j:
        jstreams = [
            ("ab", ar.mul_f32(bmv(G, dm_blk(idx_cd)), 2.0), idx_ab),
            ("cd", ar.mul_f32(bmv(t12(G), dm_blk(idx_ab)), 2.0), idx_cd),
        ]
    if with_k:
        shape5 = (T, nfa, nfb, nfc, nfd)
        G4 = (
            df.DF64(G.hi.reshape(shape5), G.lo.reshape(shape5))
            if isdf
            else G.reshape(shape5)
        )
        idx_ac = blk_idx(ao_a, nfa, ao_c, nfc) + off
        idx_ad = blk_idx(ao_a, nfa, ao_d, nfd) + off
        idx_bc = blk_idx(ao_b, nfb, ao_c, nfc) + off
        idx_bd = blk_idx(ao_b, nfb, ao_d, nfd) + off
        kstreams = [
            ("ac", bmv(perm(G4, (0, 1, 3, 2, 4), nfa * nfc, nfb * nfd), dm_blk(idx_bd)), idx_ac),
            ("ad", bmv(perm(G4, (0, 1, 4, 2, 3), nfa * nfd, nfb * nfc), dm_blk(idx_bc)), idx_ad),
            ("bc", bmv(perm(G4, (0, 2, 3, 1, 4), nfb * nfc, nfa * nfd), dm_blk(idx_ad)), idx_bc),
            ("bd", bmv(perm(G4, (0, 2, 4, 1, 3), nfb * nfd, nfa * nfc), dm_blk(idx_ac)), idx_bd),
        ]
    return jstreams, kstreams


def _flat(x):
    if isinstance(x, df.DF64):
        return df.DF64(x.hi.reshape(-1), x.lo.reshape(-1))
    return x.reshape(-1)


def _tile_chunk(tier, G, aos, locs, tbq, ls, dm, nao, with_j, with_k,
                EJ, EK, bound, eoffs, W, axis_name=None, n_dm=1):
    """Scatter-free accumulation of one chunk into the extended (E, E)
    Fock accumulators (``accum='tile'``).

    Every task of the chunk belongs to ONE supertile quadruple (the plan
    guarantees it; ``tbq`` (4,) = per-center tile base shell).  Per
    output stream xy: gather the complement-pair dm rows (T, nfo) in
    XLA, then one Pallas kernel (ops/accum_tile.py::fused_contract_tile)
    contracts G with them and bilinear-one-hot-accumulates the exact
    integer limb sums of the dense (W, W) shell tile on the MXU -- no
    per-element scatter anywhere (reference contrast: atomicAdd,
    jk/1q1t.cu:423-643).  The tile is folded to DF64 and added into the
    E-space accumulator with one dynamic_update_slice.

    Under ``axis_name`` the int32 limb tiles are psum'd before
    conversion, so the multi-chip result is bit-identical to the
    single-chip result of the same plan (integer adds associate)."""
    from ..ops.accum_tile import (
        dm_rows_t, fused_contract_tile, tile_limbs_to_df64,
    )

    ar = get_arith(tier)
    isdf = tier in ("df64", "fp64")
    nfs = tuple(_nf(l) for l in ls)
    T = locs[0].shape[0]

    def blk_idx(ao_x, nx, ao_y, ny):
        fx = jnp.arange(nx, dtype=jnp.int32)
        fy = jnp.arange(ny, dtype=jnp.int32)
        return (
            (ao_x[:, None, None] + fx[None, :, None]) * nao
            + ao_y[:, None, None]
            + fy[None, None, :]
        ).reshape(T, nx * ny)

    def dm_blk(idx):
        if isdf:
            return df.DF64(
                jnp.take(dm.hi.reshape(-1), idx),
                jnp.take(dm.lo.reshape(-1), idx),
            )
        return jnp.take(dm.reshape(-1), idx)

    def t12(x):
        if isdf:
            return df.DF64(x.hi.transpose(0, 2, 1), x.lo.transpose(0, 2, 1))
        return x.transpose(0, 2, 1)

    def perm(x4, axes, m, n):
        if isdf:
            return df.DF64(
                x4.hi.transpose(axes).reshape(T, m, n),
                x4.lo.transpose(axes).reshape(T, m, n),
            )
        return x4.transpose(axes).reshape(T, m, n)

    nfa, nfb, nfc, nfd = nfs
    streams = []
    if with_j:
        streams += [("j", 0, 1, 2, 3, G, 2.0), ("j", 2, 3, 0, 1, t12(G), 2.0)]
    if with_k:
        shape5 = (T, nfa, nfb, nfc, nfd)
        G4 = (
            df.DF64(G.hi.reshape(shape5), G.lo.reshape(shape5))
            if isdf
            else G.reshape(shape5)
        )
        streams += [
            ("k", 0, 2, 1, 3, perm(G4, (0, 1, 3, 2, 4), nfa * nfc, nfb * nfd), 1.0),
            ("k", 0, 3, 1, 2, perm(G4, (0, 1, 4, 2, 3), nfa * nfd, nfb * nfc), 1.0),
            ("k", 1, 2, 0, 3, perm(G4, (0, 2, 3, 1, 4), nfb * nfc, nfa * nfd), 1.0),
            ("k", 1, 3, 0, 2, perm(G4, (0, 2, 4, 1, 3), nfb * nfd, nfa * nfc), 1.0),
        ]
    # n_dm > 1: the ERI evaluation and the G stream permutations are
    # shared; only the dm gather + fused kernel run per density (the
    # reference compiles n_dm into its kernels, backend/jk_1qnt.py).
    # EJ/EK are (E, E) for n_dm == 1 (the common SCF case) and
    # (n_dm, E, E) for batches.
    for kind, xi, yi, ui, vi, Gp, fac in streams:
        nfo = nfs[ui] * nfs[vi]
        base_idx = blk_idx(aos[ui], nfs[ui], aos[vi], nfs[vi])
        lx = jnp.clip(locs[xi] - tbq[xi], 0, W - 1)
        ly = jnp.clip(locs[yi] - tbq[yi], 0, W - 1)
        nfx, nfy = nfs[xi], nfs[yi]

        def fold2(x):
            return x.reshape(W, W, nfx, nfy).transpose(0, 2, 1, 3).reshape(
                W * nfx, W * nfy
            )

        r0 = eoffs[xi] + tbq[xi] * nfx
        c0 = eoffs[yi] + tbq[yi] * nfy
        tgt = EJ if kind == "j" else EK
        for d in range(n_dm):
            dvals = dm_blk(base_idx + d * nao * nao)
            if fac != 1.0:
                dvals = ar.mul_f32(dvals, fac)  # exact: power of two
            dt = dm_rows_t(dvals, nfo)
            limbs, sexp = fused_contract_tile(Gp, dt, lx, ly, W, W, bound)
            li = limbs.astype(jnp.int32)
            if axis_name is not None:
                li = jax.lax.psum(li, axis_name)
            dd = tile_limbs_to_df64(li, sexp)  # (W, W, nfx*nfy) DF64
            dd = df.DF64(fold2(dd.hi), fold2(dd.lo))
            start = (
                (r0, c0) if n_dm == 1
                else (jnp.int32(d), r0, c0)  # match traced r0/c0 dtype
            )
            size = (
                (W * nfx, W * nfy) if n_dm == 1
                else (1, W * nfx, W * nfy)
            )
            if n_dm > 1:
                dd = df.DF64(dd.hi[None], dd.lo[None])
            cur = df.DF64(
                jax.lax.dynamic_slice(tgt.hi, start, size),
                jax.lax.dynamic_slice(tgt.lo, start, size),
            )
            new = df.add(cur, dd)
            tgt = df.DF64(
                jax.lax.dynamic_update_slice(tgt.hi, new.hi, start),
                jax.lax.dynamic_update_slice(tgt.lo, new.lo, start),
            )
        if kind == "j":
            EJ = tgt
        else:
            EK = tgt
    return EJ, EK


def _cat_vals(parts):
    if isinstance(parts[0], df.DF64):
        return df.DF64(
            jnp.concatenate([p.hi for p in parts]),
            jnp.concatenate([p.lo for p in parts]),
        )
    return jnp.concatenate(parts)


def _class_scan_body(ls, nprims, tier, nao, with_j, with_k, omega,
                     tables, tasks, dm, vj, vk, bound, axis_name=None,
                     accum="scatter", nrows=0, tile=8, n_dm=1, chunk_b=None,
                     eoffs=None, tile_w=64):
    """Traced body of one class scan (shared by the per-class, fused, and
    sharded execution paths).

    ``bound`` is a replicated f32 scalar upper bound on every
    contribution magnitude in this class (host-computed from the
    screened Schwarz x density bound).  Using it as the limb scale --
    instead of a data-dependent per-chunk max -- makes the scatter scale
    identical on every device, so with ``axis_name`` set (inside
    shard_map) the int32 limb scatters combine with one exact ``psum``
    per chunk: integer adds are associative, hence the multi-chip result
    is bit-identical to the single-chip result of the same plan.  (A
    pmax-agreed dynamic scale was tried first, but collectives inside a
    ``lax.scan`` body under ``shard_map(check_vma=False)`` mis-executed
    on the CPU mesh -- the static bound is both safer and cheaper.)

    ``accum='block'`` (tile-grouped plans only): contributions are first
    segment-reduced over the chunk's (group-slot, tile-row) space by the
    exact int8 one-hot MXU matmul (ops/accum.py::block_accumulate), and
    only the reduced BLOCK rows go through the per-element scatter --
    cutting the serialized scatter rows by the mean tasks-per-block
    factor.  The per-element scatter is the TPU's weak spot (the
    reference leans on atomicAdd for these 2.5G adds per Fock build);
    the MXU matmul is its strength."""
    isdf = tier in ("df64", "fp64")
    # block reductions are single-dm (driver loops or overrides to
    # scatter); the tile path batches dms natively (one ERI pass)
    assert not (accum == "block" and n_dm > 1)
    nfs = tuple(_nf(l) for l in ls)

    def _accum_scatter(acc, streams):
        joined = _cat_vals([_flat(v) for _, v, _ in streams])
        jix = jnp.concatenate([i.reshape(-1) for _, _, i in streams])
        limbs, sexp = scatter_limbs(
            joined, jix, n_dm * nao * nao, x_abs_max=bound
        )
        if axis_name is not None:
            limbs = jax.lax.psum(limbs, axis_name)
        return df.add(acc, limbs_to_df64(limbs, sexp))

    def _accum_block(acc, streams, locs, tb4, gs, B):
        """Tile-reduce each stream, then scatter only block rows.

        Under ``axis_name`` (shard_map) the per-device partial block
        sums are psum'd INSIDE the block accumulator while still
        integers, so every device holds the identical global blocks;
        the block-row scatter below is then replicated (no limb psum)
        and the result stays bit-identical to single-chip."""
        cidx = {"a": 0, "b": 1, "c": 2, "d": 3}
        S = tile
        G_slots = nrows // (S * S)
        vals_out, idx_out = [], []
        # exactness constraints are on the FULL chunk (B tasks across
        # all devices), not the per-device slice
        Bfull = chunk_b if chunk_b is not None else locs[0].shape[0]
        T = locs[0].shape[0]
        from ..ops.accum_pallas import pallas_accum_ok

        use_pallas = (
            jax.default_backend() == "tpu"
            and Bfull * 127 < (1 << 24)
            and pallas_accum_ok(T, nrows)
        )
        if use_pallas:
            from ..ops.accum_pallas import block_accumulate_pallas as _ba
        else:
            _ba = block_accumulate
        for xy, vals, _ in streams:
            x, y = xy
            jx, jy = locs[cidx[x]], locs[cidx[y]]
            rowkey = gs * (S * S) + (jx % S) * S + (jy % S)
            blocks = _ba(vals, rowkey, nrows, x_abs_max=bound,
                         axis_name=axis_name)
            # block row -> flat nao^2 index (spill row nao^2 for pad/
            # out-of-class rows)
            nfx = _nf(ls[cidx[x]])
            nfy = _nf(ls[cidx[y]])
            ns_x = tables[cidx[x]][3].shape[0] - 1  # real shells (last = pad)
            ns_y = tables[cidx[y]][3].shape[0] - 1
            rx = jnp.arange(S, dtype=jnp.int32)
            ry = jnp.arange(S, dtype=jnp.int32)
            shx = tb4[:, cidx[x]][:, None] + rx[None, :]  # (G, S)
            shy = tb4[:, cidx[y]][:, None] + ry[None, :]
            aox = jnp.take(tables[cidx[x]][3], jnp.minimum(shx, ns_x))
            aoy = jnp.take(tables[cidx[y]][3], jnp.minimum(shy, ns_y))
            ok = (shx[:, :, None] < ns_x) & (shy[:, None, :] < ns_y)
            base = aox[:, :, None] * nao + aoy[:, None, :]  # (G, S, S)
            base = jnp.where(ok, base, nao * nao)
            fx = jnp.arange(nfx, dtype=jnp.int32)
            fy = jnp.arange(nfy, dtype=jnp.int32)
            idx = (
                base[:, :, :, None, None]
                + fx[None, None, None, :, None] * nao
                + fy[None, None, None, None, :]
            )
            # keep the spill row out of real AO space after f offsets
            idx = jnp.where(
                base[:, :, :, None, None] >= nao * nao, nao * nao, idx
            )
            # blocks: (nrows, nfx*nfy) -> align with (G, S, S, nfx, nfy)
            vals_out.append(_flat(blocks))
            idx_out.append(idx.reshape(-1))
        joined = _cat_vals(vals_out)
        jix = jnp.concatenate(idx_out)
        limbs, sexp = scatter_limbs(
            joined, jix, nao * nao, nlimb=7,
            x_abs_max=bound * np.float32(Bfull),
        )
        # no psum: under axis_name the blocks are already global and the
        # scatter is identical on every device
        return df.add(acc, limbs_to_df64(limbs, sexp))

    def chunk(carry, t):
        vj, vk = carry
        if accum == "block":
            ja, jb, jc, jd, wc, gs, tb4 = t
            tbq = None
        elif accum == "tile":
            ja, jb, jc, jd, wc, tbq = t
            gs = tb4 = None
        else:
            # block/tile-grouped plans carry extras; a scatter override
            # (multi-dm) just ignores them
            ja, jb, jc, jd, wc = t[:5]
            gs = tb4 = tbq = None
        geom = {}
        for name, tbl, idx in zip("abcd", tables, (ja, jb, jc, jd)):
            coord, exps, coefs, _ = tbl
            geom[f"coord_{name}"] = _take(coord, idx)
            geom[f"exps_{name}"] = _take(exps, idx)
            geom[f"coefs_{name}"] = _take(coefs, idx)
        G = contracted_eri_batch(tier, ls, nprims, geom, omega)
        # fold symmetry weight (exact: powers of two)
        if isdf:
            G = df.DF64(G.hi * wc[:, None, None], G.lo * wc[:, None, None])
        else:
            G = G * wc[:, None, None]
        aos = tuple(
            jnp.take(tbl[3], idx, mode="clip")
            for tbl, idx in zip(tables, (ja, jb, jc, jd))
        )
        if accum == "tile":
            # scatter-free: fused contract+tile-accumulate kernel into
            # the extended (E, E) accumulators (vj/vk ARE those here)
            vj, vk = _tile_chunk(
                tier, G, aos, (ja, jb, jc, jd), tbq, ls, dm, nao,
                with_j, with_k, vj, vk, bound, eoffs, tile_w,
                axis_name=axis_name, n_dm=n_dm,
            )
            return (vj, vk), None
        # one ERI evaluation, n_dm contractions (reference: n_dm compiled
        # into the kernel, backend/jk_1qnt.py n_dm template arg)
        jstreams, kstreams = [], []
        for d in range(n_dm):
            js, ks = _contract_blocks(
                tier, G, aos, nfs, dm, nao, with_j, with_k,
                off=d * nao * nao,
            )
            jstreams += js
            kstreams += ks
        if accum == "block":
            locs = (ja, jb, jc, jd)
            B = ja.shape[0]
            if with_j:
                vj = _accum_block(vj, jstreams, locs, tb4, gs, B)
            if with_k:
                vk = _accum_block(vk, kstreams, locs, tb4, gs, B)
        else:
            if with_j:
                vj = _accum_scatter(vj, jstreams)
            if with_k:
                vk = _accum_scatter(vk, kstreams)
        return (vj, vk), None

    (vj, vk), _ = jax.lax.scan(chunk, (vj, vk), tasks)
    return vj, vk


@lru_cache(maxsize=None)
def _fused_scan_fn(sig, nao, with_j, with_k, omega=0.0, n_dm=1):
    """One jitted launch executing MANY class scans.

    The per-class profile run showed each separate launch costs ~4 ms of
    host dispatch (+~25 ms round-trip latency through the PJRT tunnel)
    REGARDLESS of task count -- with ~100 classes that overhead, not
    compute, dominated the whole Fock build.  Fusing the plan into a few
    launches removes it (reference analogue: the per-quartet-class
    Python loop with one sync per chunk is the same bottleneck the
    reference fights, jqc/pyscf/jk.py:209-280).

    sig: tuple of (ls, nprims, tier) per entry."""

    def fn(tables_list, tasks_list, dm_df, dm_f32, vj, vk, bounds):
        for (ls, nprims, tier, accum, nrows, tile), tbls, tasks, bound in zip(
            sig, tables_list, tasks_list, bounds
        ):
            dm = dm_df if tier in ("df64", "fp64") else dm_f32
            vj, vk = _class_scan_body(
                ls, nprims, tier, nao, with_j, with_k, omega,
                tbls, tasks, dm, vj, vk, bound,
                accum=accum, nrows=nrows, tile=tile, n_dm=n_dm,
            )
        return vj, vk

    return jax.jit(fn, donate_argnums=(4, 5))


@lru_cache(maxsize=None)
def _class_scan_fn(ls, nprims, tier, nao, with_j, with_k, omega=0.0,
                   accum="scatter", nrows=0, tile=8, n_dm=1, chunk_b=None,
                   eoffs=None, tile_w=64):
    """Jitted Fock-contribution scan for ONE task class (profile path).

    Signature: fn(tables, tasks, dm, vj, vk) -> (vj, vk), where
      tables = ((coord, exps, coefs, ao) per center a..d)  [ar-native]
      tasks  = (i_a, i_b, i_c, i_d, w[, gslot, tilebase]):
               (nchunk, B) int32 / f32 (+ (nchunk, G, 4) tile bases for
               the block-accumulation plan, or (nchunk, 4) supertile
               bases for the tile plan)
      dm     = (nao, nao) ar-native; vj/vk DF64 (nao*nao,) accumulators
               (accum='tile': the (E, E) extended accumulators instead;
               eoffs = the 4 class E-row offsets, tile_w = W).
    """

    def fn(tables, tasks, dm, vj, vk, bound):
        return _class_scan_body(
            ls, nprims, tier, nao, with_j, with_k, omega,
            tables, tasks, dm, vj, vk, bound,
            accum=accum, nrows=nrows, tile=tile, n_dm=n_dm, chunk_b=chunk_b,
            eoffs=eoffs, tile_w=tile_w,
        )

    return jax.jit(fn, donate_argnums=(3, 4))


@lru_cache(maxsize=None)
def _sharded_class_scan_fn(mesh, ls, nprims, tier, nao, with_j, with_k,
                           omega=0.0, n_dm=1, accum="scatter", nrows=0,
                           tile=8, chunk_b=None, n_tasks=5, eoffs=None,
                           tile_w=64):
    """Multi-chip variant of ``_class_scan_fn``: the task chunks (axis 1,
    the within-chunk batch) are sharded over the mesh's ``tasks`` axis;
    dm / tables / accumulators are replicated; the per-chunk int32 limb
    scatters are psum'd (exact -- see ``_class_scan_body``).

    TPU-native multi-chip Fock build (SURVEY SS2.8: the reference is
    single-GPU, /root/reference/README.md:104 -- this axis is where the
    TPU build exceeds the reference)."""
    try:  # jax >= 0.6 exposes shard_map at top level
        from jax import shard_map as _shard_map
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map as _shard_map
    from jax.sharding import PartitionSpec as P

    def fn(tables, tasks, dm, vj, vk, bound):
        return _class_scan_body(
            ls, nprims, tier, nao, with_j, with_k, omega,
            tables, tasks, dm, vj, vk, bound, axis_name="tasks",
            n_dm=n_dm, accum=accum, nrows=nrows, tile=tile, chunk_b=chunk_b,
            eoffs=eoffs, tile_w=tile_w,
        )

    if n_tasks == 7:
        # task tuple = (ia, ib, ic, id, w, gslot, tb4): the within-chunk
        # batch axis of the first six shards over the mesh; the per-chunk
        # tile-base table tb4 (nchunk, G, 4) is replicated.  (Present
        # whenever the PLAN is block-grouped, even if accum was
        # overridden to scatter for a multi-dm pass.)
        task_specs = (P(None, "tasks"),) * 6 + (P(),)
    elif n_tasks == 6:
        # tile plan: (ia..id, w) shard; supertile bases (nchunk, 4)
        # replicated
        task_specs = (P(None, "tasks"),) * 5 + (P(),)
    else:
        task_specs = (P(None, "tasks"),) * 5
    sharded = _shard_map(
        fn,
        mesh=mesh,
        in_specs=(P(), task_specs, P(), P(), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(3, 4))


def _dev_array(x):
    """Host->device upload, narrowing the wire format where exact.

    The 513-AO bench plan is ~2.6 GB of int32 task indices; through the
    PJRT tunnel transfer time is material.  Class-local shell indices
    almost always fit int16 and symmetry weights (powers of two in
    [0.125, 1] and 0) are exact in f16, so those are shipped narrow and
    widened on device (one cheap cast each)."""
    x = np.asarray(x)
    # disk plans arrive pre-narrowed (utils/plancache._narrow, possibly
    # memory-mapped): ship as-is, widen on device
    if x.dtype == np.int16:
        return jnp.asarray(x).astype(jnp.int32)
    if x.dtype == np.float16:
        return jnp.asarray(x).astype(jnp.float32)
    if x.dtype == np.int32 and x.size:
        mx = int(x.max())
        mn = int(x.min())
        if 0 <= mn and mx < 32767:
            return jnp.asarray(x.astype(np.int16)).astype(jnp.int32)
    elif x.dtype == np.float32 and x.size:
        xh = x.astype(np.float16)
        if np.array_equal(xh.astype(np.float32), x):
            return jnp.asarray(xh).astype(jnp.float32)
    return jnp.asarray(x)


def _plan_to_device(plan):
    """Host plan -> entries whose device upload happens LAZILY.

    The bench plan is GB-scale (131M tasks at 486 AO); uploading it all
    before the first class scan serializes a multi-GB tunnel transfer in
    front of the compute.  Entries keep their (memory-mapped) numpy task
    arrays; ``_entry_tasks_dev`` uploads each entry once on first use --
    uploads overlap compiles/executions of earlier entries, and SCF
    iterations 2+ reuse the cached device refs."""
    out = []
    for e in plan:
        d = dict(e)
        d["bound"] = jnp.asarray(np.float32(e["bound"]))
        out.append(d)
    return out


def _entry_tasks_dev(entry):
    """Device-resident task arrays for one plan entry (cached)."""
    dev = entry.get("_tasks_dev")
    if dev is None:
        dev = tuple(_dev_array(t) for t in entry["tasks"])
        entry["_tasks_dev"] = dev
    return dev


def _chunk_size(ls, ntasks=None, target_elems=1 << 21, nprims=None, tier=None):
    """Task chunk size: per-device autotuned table first (the analogue of
    the reference's optimal_scheme JSONs, jqc/backend/jk.py:38-53), then
    a Pallas-eligibility ladder on TPU, then an analytic heuristic.

    Round-3 on-chip measurements (CLAUDE.md perf table): the Pallas
    class kernel at its VMEM-eligible chunk beats the XLA fallback by
    3-20x (e.g. (1,0,0,0)x3333 f32: 45 vs 10 Mt/s; (2,0,0,0) df64: 10.4
    vs 5.6), while the round-1 'huge chunk' caps (65536) silently pushed
    every low-l class OFF the Pallas path.  Tier ladders stop at the
    measured sweet spots (f32 16384, df64 8192 -- larger df64 chunks
    pass the static VMEM estimate but thrash: 16384 measured 6x SLOWER
    than 8192 on (1,0,0,0))."""
    if nprims is not None and tier is not None:
        from ..utils.autotune import tuned_chunk

        b = tuned_chunk(ls, nprims, tier)
        if b is not None:
            if ntasks is not None:
                b = min(b, 1 << int(np.ceil(np.log2(max(ntasks, 64)))))
            return int(b)
    if nprims is not None and tier is not None:
        import jax

        from ..ops.eri import _USE_PALLAS
        from ..ops.eri_pallas import pallas_supported

        if _USE_PALLAS and jax.default_backend() == "tpu":
            ladder = (
                (16384, 8192, 4096, 2048, 1024)
                if tier in ("f32", "fp32")
                else (8192, 4096, 2048, 1024)
            )
            for b in ladder:
                if pallas_supported(tier, ls, nprims, b):
                    if ntasks is not None:
                        b = min(
                            b, 1 << int(np.ceil(np.log2(max(ntasks, 64))))
                        )
                    return int(b)
    nfab = _nf(ls[0]) * _nf(ls[1])
    nfcd = _nf(ls[2]) * _nf(ls[3])
    nfel = nfab * nfcd
    b = target_elems // nfel
    b = 1 << int(np.floor(np.log2(max(b, 128))))
    if ntasks is not None:
        # don't pad tiny task lists up to a huge chunk
        b = min(b, 1 << int(np.ceil(np.log2(max(ntasks, 64)))))
    cap = 65536 if nfel <= 9 else (16384 if nfel <= 81 else 8192)
    return int(min(b, cap))


class JKEngine:
    """Contracted-task mixed-precision get_jk over a BasisLayout."""

    def __init__(
        self,
        layout: BasisLayout,
        cutoff_fp32: float = 1e-13,
        cutoff_fp64: float = 1e-6,
        mesh=None,
        merge_nprim: bool | None = None,
        accum: str = "auto",
        tile: int = 8,
        tile_w: int = 64,
    ):
        self.layout = layout
        self.nao = layout.nao_int
        self.cutoff_fp32 = cutoff_fp32
        self.cutoff_fp64 = cutoff_fp64
        # Fock accumulation strategy: "scatter" = per-element int32-limb
        # scatter-add; "block" = tile-grouped exact int8 MXU reduction
        # first, then a block-row scatter (ops/accum.py::block_accumulate);
        # "tile" = supertile-grouped plans + the fused contract+bilinear-
        # one-hot MXU kernel into a dense extended (E, E) accumulator with
        # NO scatter anywhere (ops/accum_tile.py; one final fold matmul)
        # -- the per-element scatter serializes on TPU and dominates large
        # Fock builds.  "auto" (default) picks per class from the
        # per-device autotune table (utils/autotune.py; the analogue of
        # the reference's per-device scheme files, jqc/backend/data/),
        # falling back to scatter where untuned.  Multi-dm batches
        # override block/tile->scatter per entry (those reductions are
        # single-dm; batching limbs over dms is future work).
        # ``tile`` = shell-tile edge S (rows per block = S^2) of the
        # block path; ``tile_w`` = supertile shell width W of the tile
        # path.
        self.accum = accum
        self.tile = tile
        self.tile_w = tile_w
        self._eoff = None
        self._efold_mat = None
        # multi-chip: a jax.sharding.Mesh with a "tasks" axis; task batches
        # are sharded over it and limb scatters psum'd exactly, so the
        # sharded get_jk is bit-identical to the single-chip one
        self.mesh = mesh
        self._ndev = 1 if mesh is None else int(np.prod(mesh.devices.shape))
        # nprim-bucket merging: small systems are launch-bound (~4 ms per
        # class dispatch), so collapsing the up-to-16 bucket combos per
        # l-quartet into one wins; large systems are compute-bound and
        # prefer tight buckets (no padded primitive-quartet waste)
        if merge_nprim is None:
            merge_nprim = layout.nao_int < 400
        self.merge_nprim = merge_nprim
        self.classes = build_shell_classes(layout, merge_nprim=merge_nprim)
        self.pair_classes = build_pair_classes(self.classes)
        self._tables32 = None
        self._tables64 = None
        self._plan = None
        self._plan_logdm = None
        # per-class profiling (set profile=True to populate; the analogue
        # of the reference's per-quartet-class CUDA-event timing logs)
        self.profile = False
        self.class_time: dict = {}
        # classes fused per compiled launch; None = one launch per class.
        # Measured on the v5e tunnel at (H2O)4/6-31g: fused (24/launch)
        # 0.47 s/iter vs per-class 0.43 s/iter -- async per-class dispatch
        # already overlaps host and device, so fusing only pays when
        # dispatch cost grows (very many tiny classes); keep it opt-in.
        self.fuse_group = None

    # ------------------------------------------------------------- espace
    def _espace(self):
        """Extended AO row space for tile accumulation: one contiguous
        row range per class of max(ns, W)*nf rows (shell-major,
        component-minor), so every supertile flush is one dense
        dynamic_update_slice.  Segments of split contractions occupy
        separate E rows; the fold matrix recombines them exactly."""
        if self._eoff is None:
            W = self.tile_w
            offs = []
            E = 0
            for c in self.classes:
                offs.append(E)
                E += max(c.nshell - 1, W) * _nf(c.l)
            self._eoff = (offs, E)
        return self._eoff

    def _efold(self):
        """(E, nao) 0/1 fold matrix: E-space rows -> internal AO rows.
        vj_int = R^T @ VJ_E @ R (host f64 matmuls, exact: 0/1 weights)."""
        if self._efold_mat is None:
            offs, E = self._espace()
            R = np.zeros((E, self.nao))
            for c, off in zip(self.classes, offs):
                nf = _nf(c.l)
                ns = c.nshell - 1
                rows = (
                    off + np.arange(ns)[:, None] * nf + np.arange(nf)
                ).ravel()
                cols = (c.ao[:ns, None] + np.arange(nf)).ravel()
                R[rows, cols] = 1.0
            self._efold_mat = R
        return self._efold_mat

    # -------------------------------------------------------------- tables
    def _tables(self, tier):
        if tier == "f32":
            if self._tables32 is None:
                self._tables32 = [
                    (
                        jnp.asarray(c.coords, jnp.float32),
                        jnp.asarray(c.exps, jnp.float32),
                        jnp.asarray(c.coefs, jnp.float32),
                        jnp.asarray(c.ao, jnp.int32),
                    )
                    for c in self.classes
                ]
            return self._tables32
        if self._tables64 is None:
            self._tables64 = [
                (
                    df.from_f64(c.coords),
                    df.from_f64(c.exps),
                    df.from_f64(c.coefs),
                    jnp.asarray(c.ao, jnp.int32),
                )
                for c in self.classes
            ]
        return self._tables64

    # ------------------------------------------------------------ schwarz
    def _q_raw(self, pc, omega=0.0):
        """f32 Schwarz diag sqrt-log bound per pair, in CURRENT pair order."""
        c1, c2 = self.classes[pc.ci], self.classes[pc.cj]
        ls = (c1.l, c2.l, c1.l, c2.l)
        nprims = (c1.nprim, c2.nprim, c1.nprim, c2.nprim)
        P = pc.npair
        B = _chunk_size(ls, P)
        q = np.zeros(P, np.float32)
        fn = _q_diag_fn(ls, nprims, float(omega))
        t32 = self._tables(tier="f32")
        tb1, tb2 = t32[pc.ci], t32[pc.cj]
        for s in range(0, P, B):
            i = pc.i_loc[s : s + B]
            j = pc.j_loc[s : s + B]
            pad = B - len(i)
            if pad:
                i = np.concatenate(
                    [i, np.full(pad, c1.nshell - 1, np.int32)]
                )
                j = np.concatenate(
                    [j, np.full(pad, c2.nshell - 1, np.int32)]
                )
            qq = fn(tb1, tb2, jnp.asarray(i), jnp.asarray(j))
            q[s : s + B] = np.asarray(qq)[: min(B, P - s)]
        return np.log(np.maximum(q, 1e-38)) * 0.5

    def _q_cache_path(self, pc, omega):
        """Disk path for one pair class's Schwarz bounds (geometry-keyed).

        The q phase costs minutes of tunnel round trips per plan build
        but is density-independent, so it persists like the plan itself
        (utils/plancache.py)."""
        import hashlib
        import os

        base = os.environ.get(
            "JQC_CACHE_DIR", os.path.expanduser("~/.cache/joltqc_tpu")
        )
        if base in ("0", "off", "none") or os.environ.get(
            "JQC_PLAN_CACHE", "1"
        ) in ("0", "off", "none"):
            return None
        base = base.rstrip("/")
        if base.endswith("/xla"):
            base = base[:-4]
        h = hashlib.sha256()
        for k in (pc.ci, pc.cj):
            c = self.classes[k]
            h.update(np.int64([c.l, c.nprim, c.nshell]).tobytes())
            for a in (c.coords, c.exps, c.coefs):
                h.update(np.ascontiguousarray(a).tobytes())
        h.update(np.float64([omega]).tobytes())
        return os.path.join(base, "plans", f"q_{h.hexdigest()[:24]}.npz")

    def _ensure_q(self, pc, omega=0.0):
        """Pair Schwarz bounds; per-omega variants share the omega=0 sort
        order (valid: the erf-attenuated (ab|ab)_w is bounded by the full
        -Coulomb value, so the omega=0 candidate generation is a superset;
        reference per-omega q_matrix: jqc/pyscf/basis.py:218-243)."""
        import os

        omega = float(omega or 0.0)

        def save(path, **arrs):
            try:
                os.makedirs(os.path.dirname(path), exist_ok=True)
                tmp = path + f".tmp{os.getpid()}"
                with open(tmp, "wb") as f:
                    np.savez(f, **arrs)
                os.replace(tmp, path)
            except OSError:
                pass

        if pc.q_log is None:
            path = self._q_cache_path(pc, 0.0)
            if path is not None and os.path.exists(path):
                try:
                    with np.load(path) as z:
                        q, order = z["q"], z["order"]
                    pc.i_loc = pc.i_loc[order]
                    pc.j_loc = pc.j_loc[order]
                    pc.diag = pc.diag[order]
                    pc.q_log = q
                except Exception:
                    pc.q_log = None
            if pc.q_log is None:
                pc.q_log = self._q_raw(pc)
                order = np.argsort(-pc.q_log, kind="stable")
                sort_pairs_by_q(pc)
                if path is not None:
                    save(path, q=pc.q_log, order=order)
        if omega == 0.0:
            return pc.q_log
        if omega not in pc.q_omega:
            # cached per-omega bounds are aligned with the SORTED pair
            # order (they are always computed/saved after the q_log sort)
            path = self._q_cache_path(pc, omega)
            if path is not None and os.path.exists(path):
                try:
                    with np.load(path) as z:
                        pc.q_omega[omega] = z["q"]
                except Exception:
                    pass
            if omega not in pc.q_omega:
                pc.q_omega[omega] = self._q_raw(pc, omega)
                if path is not None:
                    save(path, q=pc.q_omega[omega])
        return pc.q_omega[omega]

    # --------------------------------------------------------------- plan
    def _build_plan(self, logdm, dm_cond_log=None, omega=0.0):
        """Screened task plan.

        ``logdm``: global log max |dm| bound (candidate generation).
        ``dm_cond_log``: optional (nbas, nbas) log shell-block density
        bounds; with it each task's bound is q_ij + q_kl + max over the
        six relevant dm blocks -- matching the reference's per-element
        screening (jk/screen_jk_tasks.cu:240-262) instead of one global
        density bound.  ``omega > 0`` additionally re-screens and
        re-tiers with the erf-attenuated per-omega Schwarz bounds.
        Tier statistics are recorded in ``self.plan_stats``.
        """
        omega = float(omega or 0.0)
        log32 = np.log(self.cutoff_fp32) - logdm
        log64 = np.log(self.cutoff_fp64) - logdm
        log32_abs = float(np.log(self.cutoff_fp32))
        log64_abs = float(np.log(self.cutoff_fp64))
        refine = dm_cond_log is not None or omega != 0.0
        stats = dict(ntasks=0, n64=0, cand=0, cand64=0)
        plan = []
        for p1i in range(len(self.pair_classes)):
            p1 = self.pair_classes[p1i]
            self._ensure_q(p1)
            for p2i in range(p1i + 1):
                p2 = self.pair_classes[p2i]
                self._ensure_q(p2)
                same = p1i == p2i
                c = [self.classes[k] for k in (p1.ci, p1.cj, p2.ci, p2.cj)]
                ls = tuple(x.l for x in c)
                nprims = tuple(x.nprim for x in c)
                tier_data = None  # [(tier, t1, t2, w, dqmax)]
                if refine and dm_cond_log is not None:
                    # fused native screen (candidate generation + six-block
                    # density refinement + tier routing in one C++ pass;
                    # joltqc_tpu/native/screen.cpp -- the host analogue of
                    # the reference's screen_jk_tasks.cu)
                    from ..native import screen_tasks_native

                    q1o = self._ensure_q(p1, omega)
                    q2o = self._ensure_q(p2, omega)
                    res = screen_tasks_native(
                        p1.q_log, p2.q_log, q1o, q2o,
                        c[0].shell_ids[p1.i_loc], c[1].shell_ids[p1.j_loc],
                        c[2].shell_ids[p2.i_loc], c[3].shell_ids[p2.j_loc],
                        p1.diag, p2.diag, dm_cond_log, same,
                        log32, log64, log32_abs, log64_abs,
                    )
                    if res is not None:
                        f32t, df64t, cand, cand64 = res
                        stats["cand"] += cand
                        stats["cand64"] += cand64
                        tier_data = [
                            ("df64",) + df64t, ("f32",) + f32t,
                        ]
                if tier_data is None:
                    t1, t2, w, tier64 = build_quartet_tasks(
                        p1, p2, same, log32, log64
                    )
                    if len(t1) == 0:
                        continue
                    if refine:
                        stats["cand"] += len(t1)
                        stats["cand64"] += int(tier64.sum())
                        q1 = self._ensure_q(p1, omega)
                        q2 = self._ensure_q(p2, omega)
                        qsum = q1[t1] + q2[t2]
                        if dm_cond_log is not None:
                            D = dm_cond_log
                            i = c[0].shell_ids[p1.i_loc[t1]]
                            j = c[1].shell_ids[p1.j_loc[t1]]
                            k = c[2].shell_ids[p2.i_loc[t2]]
                            ll = c[3].shell_ids[p2.j_loc[t2]]
                            dmx = np.maximum.reduce(
                                [D[i, j], D[k, ll], D[i, k], D[i, ll],
                                 D[j, k], D[j, ll]]
                            )
                        else:
                            dmx = np.full(len(t1), logdm, np.float32)
                        dq = qsum + dmx
                        keep = dq > log32_abs
                        t1, t2, w = t1[keep], t2[keep], w[keep]
                        dq = dq[keep]
                        tier64 = dq > log64_abs
                    else:
                        dq = p1.q_log[t1] + p2.q_log[t2] + logdm
                    tier_data = []
                    for tier, sel in (("df64", tier64), ("f32", ~tier64)):
                        if int(sel.sum()):
                            tier_data.append(
                                (tier, t1[sel], t2[sel], w[sel],
                                 float(dq[sel].max()))
                            )
                ntot = sum(len(td[1]) for td in tier_data)
                if ntot == 0:
                    continue
                stats["ntasks"] += ntot
                stats["n64"] += sum(
                    len(td[1]) for td in tier_data if td[0] == "df64"
                )
                # static limb-scale bound for the scatter accumulation:
                # |contribution| <= 2 * nf_sum * exp(q_ij+q_kl+dm_block)
                # (2: the vj double-count factor; nf_sum: the densest
                # block contraction length).  Rigorous -> the int32 limb
                # decomposition never clips, on any device partitioning.
                nf = [_nf(x) for x in ls]
                nf_sum = max(
                    nf[0] * nf[1], nf[2] * nf[3], nf[0] * nf[2],
                    nf[0] * nf[3], nf[1] * nf[2], nf[1] * nf[3],
                )
                for tier, s1, s2, sw, dmax in tier_data:
                    n = len(s1)
                    if n == 0:
                        continue
                    bound_log = dmax + np.log(2.0 * nf_sum) + 0.5
                    bound = np.float32(np.exp(min(bound_log, 80.0)))
                    B = _chunk_size(ls, n, nprims=nprims, tier=tier)
                    if self._ndev > 1:
                        # within-chunk batch is sharded over the mesh
                        B = -(-B // self._ndev) * self._ndev
                    # pow2-bucket the chunk count so plans rebuilt at
                    # different density bounds (incremental direct SCF)
                    # reuse the same compiled shapes
                    nchunk_req = -(-n // B)
                    nchunk_pow2 = 1 << int(np.ceil(np.log2(max(nchunk_req, 1))))
                    npad = nchunk_pow2 * B - n
                    ia0 = p1.i_loc[s1]
                    ib0 = p1.j_loc[s1]
                    ic0 = p2.i_loc[s2]
                    id0 = p2.j_loc[s2]
                    accum, extra = "scatter", None
                    want_block = self.accum == "block"
                    want_tile = self.accum == "tile"
                    if self.accum == "auto":
                        from ..utils.autotune import tuned_accum

                        tuned = tuned_accum(ls, nprims, tier)
                        want_block = tuned == "block"
                        want_tile = tuned == "tile"
                        if tuned is None:
                            # untuned class: default to the scatter-free
                            # tile path on TPU -- the per-element scatter
                            # serializes at ~40M rows/s and dominated the
                            # r3 bench (80-95% of class-scan time); the
                            # fused MXU tile kernel replaces it outright.
                            # A committed/measured autotune table
                            # overrides per class (utils/autotune.py).
                            import jax as _jax

                            want_tile = _jax.default_backend() == "tpu"
                    if want_tile and B % 128 == 0 and B * 127 < (1 << 24):
                        # supertile-quadruple grouping for the scatter-
                        # free fused kernel (each chunk's tasks live in
                        # ONE (W-shell)^4 supertile; pad within groups)
                        Wt = self.tile_w
                        ns4 = [x.nshell - 1 for x in c]
                        nt4 = [max(1, -(-ns // Wt)) for ns in ns4]
                        locs4 = (ia0, ib0, ic0, id0)
                        karr = [
                            np.minimum(a // Wt, nt - 1)
                            for a, nt in zip(locs4, nt4)
                        ]
                        key = (
                            (karr[0].astype(np.int64) * nt4[1] + karr[1])
                            * nt4[2] + karr[2]
                        ) * nt4[3] + karr[3]
                        order = np.argsort(key, kind="stable")
                        ia0, ib0, ic0, id0 = (
                            ia0[order], ib0[order], ic0[order], id0[order]
                        )
                        sw = sw[order]
                        key = key[order]
                        ukey, counts = np.unique(key, return_counts=True)
                        # adapt the chunk to the supertile-group sizes:
                        # per-group pow2 padding at a huge B inflates
                        # entries whose groups are all small (observed
                        # up to 20x task inflation at B=16384 over ~100
                        # small groups).  One B per entry keeps one
                        # compiled shape.
                        B = max(128, min(B, 1 << int(
                            np.ceil(np.log2(int(counts.max())))
                        )))
                        if self._ndev > 1:
                            B = -(-B // self._ndev) * self._ndev
                        m = (-(-counts // B) * B).astype(np.int64)
                        out_start = np.concatenate(
                            [[0], np.cumsum(m)]
                        )[:-1]
                        task_start = np.concatenate(
                            [[0], np.cumsum(counts)]
                        )[:-1]
                        pos = (
                            np.arange(n)
                            - np.repeat(task_start, counts)
                            + np.repeat(out_start, counts)
                        )
                        nchunk_req = int(m.sum()) // B
                        nchunk_pow2 = 1 << int(
                            np.ceil(np.log2(max(nchunk_req, 1)))
                        )
                        ntot_f = nchunk_pow2 * B

                        def place(arr, padval, dt):
                            out = np.full(ntot_f, padval, dt)
                            out[pos] = arr
                            return out

                        # pads -> the IN-RANGE zero-coef pad shell (last
                        # table row, index nshell-1): its ERI is exactly 0
                        # (zero coefs) and every gather stays in bounds.
                        # An out-of-range pad index turns into jnp.take's
                        # "fill" semantics downstream (NaN geometry / NaN
                        # dm rows) which the tile kernel's matmuls cannot
                        # mask -- the r3 tile parity failure.
                        ia = place(ia0, c[0].nshell - 1, np.int32)
                        ib = place(ib0, c[1].nshell - 1, np.int32)
                        ic = place(ic0, c[2].nshell - 1, np.int32)
                        idd = place(id0, c[3].nshell - 1, np.int32)
                        ww = place(sw, 0.0, np.float32)
                        # decode per-group tile bases from the key
                        r = ukey
                        kd = r % nt4[3]; r //= nt4[3]
                        kc = r % nt4[2]; r //= nt4[2]
                        kb = r % nt4[1]; ka = r // nt4[1]
                        b4 = np.stack(
                            [
                                np.minimum(k * Wt, max(ns - Wt, 0))
                                for k, ns in zip((ka, kb, kc, kd), ns4)
                            ],
                            axis=1,
                        ).astype(np.int32)
                        tbq = np.repeat(b4, m // B, axis=0)
                        if nchunk_pow2 > nchunk_req:
                            tbq = np.vstack(
                                [tbq, np.zeros(
                                    (nchunk_pow2 - nchunk_req, 4), np.int32
                                )]
                            )
                        tasks = tuple(
                            np.asarray(x.reshape(nchunk_pow2, B), dt)
                            for x, dt in (
                                (ia, np.int32), (ib, np.int32),
                                (ic, np.int32), (idd, np.int32),
                                (ww, np.float32),
                            )
                        ) + (tbq,)
                        plan.append(
                            dict(
                                ls=ls, nprims=nprims, tier=tier, ntasks=n,
                                cls_idx=(p1.ci, p1.cj, p2.ci, p2.cj),
                                tasks=tasks, bound=float(bound),
                                accum="tile", nrows=0,
                            )
                        )
                        continue
                    if want_block:
                        # tile-group tasks: 4D shell-tile key, stable sort
                        # (reference contrast: atomicAdd needs no order;
                        # the TPU block accumulator wants tile locality)
                        S = self.tile
                        nt = [-(-x.nshell // S) + 1 for x in c]
                        key = (((ia0.astype(np.int64) // S) * nt[1]
                                + ib0 // S) * nt[2] + ic0 // S) * nt[3] + id0 // S
                        order = np.argsort(key, kind="stable")
                        ia0, ib0, ic0, id0 = (
                            ia0[order], ib0[order], ic0[order], id0[order]
                        )
                        sw = sw[order]
                        key = key[order]
                        keyp = np.concatenate(
                            [key, np.full(npad, key[-1] + 1 if n else 0,
                                          np.int64)]
                        ).reshape(-1, B)
                        chg = np.ones_like(keyp, bool)
                        chg[:, 1:] = keyp[:, 1:] != keyp[:, :-1]
                        gslot = np.cumsum(chg, axis=1).astype(np.int32) - 1
                        gmax = int(gslot.max()) + 1
                        G = 1 << int(np.ceil(np.log2(max(gmax, 1))))
                        if G * S * S <= 4 * B:
                            accum = "block"
                            nchunkp = keyp.shape[0]
                            tb4 = np.full((nchunkp, G, 4), 1 << 28, np.int32)
                            rows, cols = np.nonzero(chg)
                            slots = gslot[rows, cols]
                            for d, arr in enumerate((ia0, ib0, ic0, id0)):
                                arrp = np.concatenate(
                                    [arr, np.full(
                                        npad, c[d].nshell - 1, np.int32
                                    )]
                                ).reshape(nchunkp, B)
                                tb4[rows, slots, d] = (
                                    arrp[rows, cols] // S
                                ) * S
                            extra = (gslot, tb4)
                    # pad tasks point at each class's zero-coef pad shell
                    # (in range -- see the tile branch note)
                    ia = np.concatenate(
                        [ia0, np.full(npad, c[0].nshell - 1, np.int32)])
                    ib = np.concatenate(
                        [ib0, np.full(npad, c[1].nshell - 1, np.int32)])
                    ic = np.concatenate(
                        [ic0, np.full(npad, c[2].nshell - 1, np.int32)])
                    idd = np.concatenate(
                        [id0, np.full(npad, c[3].nshell - 1, np.int32)])
                    ww = np.concatenate([sw, np.zeros(npad)])
                    nchunk = len(ia) // B
                    tasks = tuple(
                        np.asarray(x.reshape(nchunk, B), dt)
                        for x, dt in (
                            (ia, np.int32), (ib, np.int32),
                            (ic, np.int32), (idd, np.int32),
                            (ww, np.float32),
                        )
                    )
                    nrows = 0
                    if accum == "block":
                        tasks = tasks + extra
                        nrows = G * self.tile * self.tile
                    plan.append(
                        dict(
                            ls=ls, nprims=nprims, tier=tier, ntasks=n,
                            cls_idx=(p1.ci, p1.cj, p2.ci, p2.cj), tasks=tasks,
                            bound=float(bound), accum=accum,
                            nrows=nrows,
                        )
                    )
        self.plan_stats = stats
        return plan

    def _build_plan_cached(self, logdm, dm_cond_log=None, omega=0.0):
        """Disk-cached ``_build_plan`` + one-time device upload.

        The plan is density-independent numpy data for a fixed
        (layout, config, density-bound) key; persisting it makes re-runs
        of the same workload (benchmarks, SCF restarts) skip the ~O(N^4)
        single-core host screen entirely (utils/plancache.py)."""
        from ..utils.plancache import load_plan, plan_key, save_plan

        import time as _time

        key = plan_key(self, logdm, dm_cond_log, omega)
        cached = load_plan(key)
        if cached is not None:
            plan, self.plan_stats = cached
        else:
            t0 = _time.perf_counter()
            plan = self._build_plan(logdm, dm_cond_log, omega)
            # persist only plans that were expensive to build (cheap ones
            # would just clutter the cache; env JQC_PLAN_CACHE_MIN_SECS)
            import os as _os

            min_secs = float(_os.environ.get("JQC_PLAN_CACHE_MIN_SECS", "5"))
            if _time.perf_counter() - t0 >= min_secs:
                save_plan(key, plan, self.plan_stats)
        return _plan_to_device(plan)

    def build_plan(self, dm_mol, omega=0.0):
        """Build (or disk-load) the screened task plan WITHOUT launching
        any kernels -- the plan-construction half of ``get_jk``.

        Used by the autotuner (utils/autotune.py) and warmup flows that
        need ``self._plan`` populated but would waste an hour of tunnel
        compiles running the full Fock build first."""
        dm = np.asarray(dm_mol, np.float64)
        if dm.ndim == 3:
            dm_int = np.stack([self.layout.dm_to_internal(d) for d in dm])
            cond = np.maximum.reduce(
                [self.layout.dm_cond(d) for d in dm_int]
            )
        else:
            dm_int = self.layout.dm_to_internal(dm)
            cond = self.layout.dm_cond(dm_int)
        D = np.log(np.maximum(cond, 1e-30)).astype(np.float32)
        self._plan = self._ensure_full_plan(D, float(D.max()),
                                            float(omega or 0.0))
        return self._plan

    def _ensure_full_plan(self, D, logdm, okey):
        if not hasattr(self, "_plans_full"):
            self._plans_full = {}
        cached = self._plans_full.get(okey)
        if cached is None or np.any(D > cached[1]):
            Dm = (D + 0.7).astype(np.float32)
            cached = (self._build_plan_cached(logdm + 0.7, Dm, okey), Dm)
            self._plans_full[okey] = cached
        return cached[0]

    # ---------------------------------------------------------------- jk
    def _run_plan(self, dm_int, with_j, with_k, omega, bucketed=False,
                  cond=None):
        """Raw folded accumulators over the canonical-task plan.

        Returns (vj, vk) as f64 (nao, nao) partials P: the symmetric-dm
        result is P + P^T (8-fold orbit unfolding).  Per-class wall times
        are accumulated into self.class_time (reference counterpart: the
        CUDA-event per-class timing logs, jqc/pyscf/jk.py:229-347)."""
        import time as _time

        nao = self.nao
        n_dm = 1 if dm_int.ndim == 2 else int(dm_int.shape[0])
        # per-shell-block density bounds (reference: max_block_pooling +
        # per-element q_ij+q_kl+max(dm) screening) with a 0.7 log-unit
        # reuse margin; plans are rebuilt only when some block outgrows
        # its margin (density shrinks toward convergence, so this is rare)
        if cond is None:
            if n_dm == 1:
                cond = self.layout.dm_cond(dm_int)
            else:
                cond = np.maximum.reduce(
                    [self.layout.dm_cond(d) for d in dm_int]
                )
        D = np.log(np.maximum(cond, 1e-30)).astype(np.float32)
        logdm = float(D.max())
        okey = float(omega or 0.0)
        if bucketed:
            # incremental path: delta-dm norms decay over the SCF, and
            # rescreening at each smaller bound drops most tasks.  Plans
            # are cached per density-bound bucket (4 log units) with
            # pow2 chunk counts, bounding the distinct compiled shapes.
            # (The selected plan stays LOCAL: the full-density plan
            # caches must not be clobbered by a delta-dm bucket plan.)
            if not hasattr(self, "_plans"):
                self._plans = {}
            bucket = (int(np.floor(logdm / 4.0)), okey)
            bound = (bucket[0] + 1) * 4.0 + 0.7
            cached = self._plans.get(bucket)
            if cached is None or np.any(D > cached[1]):
                Dm = np.minimum(D + 0.7, bound).astype(np.float32)
                cached = (self._build_plan_cached(bound, Dm, okey), Dm)
                self._plans[bucket] = cached
            plan = cached[0]
        else:
            plan = self._plan = self._ensure_full_plan(D, logdm, okey)

        dm_df = df.from_f64(dm_int)
        dm_f32 = jnp.asarray(dm_int, jnp.float32)

        vj = df.const(0.0, (n_dm * nao * nao,))
        vk = df.const(0.0, (n_dm * nao * nao,))
        has_tile = any(e.get("accum") == "tile" for e in plan)
        EJ = EK = None
        if has_tile:
            offs, E = self._espace()
            eshape = (E, E) if n_dm == 1 else (n_dm, E, E)
            EJ = df.const(0.0, eshape)
            EK = df.const(0.0, eshape)
        if (self.profile or not self.fuse_group or self.mesh is not None
                or has_tile):
            # per-class launches (async pipeline); profile=True adds a
            # sync per class for accurate attribution
            for entry in plan:
                t0 = _time.perf_counter()
                tier = entry["tier"]
                tables = self._tables(tier)
                tbls = tuple(tables[k] for k in entry["cls_idx"])
                chunk_b = int(entry["tasks"][0].shape[1])
                accum_e = entry.get("accum", "scatter")
                if n_dm > 1 and accum_e == "block":
                    accum_e = "scatter"  # block reduction is single-dm
                eoffs = None
                if accum_e == "tile":
                    eoffs = tuple(offs[k] for k in entry["cls_idx"])
                if self.mesh is not None:
                    fn = _sharded_class_scan_fn(
                        self.mesh, entry["ls"], entry["nprims"], tier, nao,
                        with_j, with_k, omega, n_dm=n_dm,
                        accum=accum_e,
                        nrows=entry.get("nrows", 0), tile=self.tile,
                        chunk_b=chunk_b, n_tasks=len(entry["tasks"]),
                        eoffs=eoffs, tile_w=self.tile_w,
                    )
                else:
                    fn = _class_scan_fn(
                        entry["ls"], entry["nprims"], tier, nao, with_j,
                        with_k, omega, accum=accum_e,
                        nrows=entry.get("nrows", 0), tile=self.tile,
                        n_dm=n_dm, chunk_b=chunk_b,
                        eoffs=eoffs, tile_w=self.tile_w,
                    )
                dm_t = dm_df if tier == "df64" else dm_f32
                if accum_e == "tile":
                    EJ, EK = fn(
                        tbls, _entry_tasks_dev(entry), dm_t, EJ, EK,
                        entry["bound"]
                    )
                else:
                    vj, vk = fn(
                        tbls, _entry_tasks_dev(entry), dm_t, vj, vk,
                        entry["bound"]
                    )
                if self.profile:
                    sync = EJ if accum_e == "tile" else (
                        vj if with_j else vk
                    )
                    jax.block_until_ready(sync.hi)
                    key = (entry["ls"], entry["nprims"], tier)
                    self.class_time[key] = self.class_time.get(key, 0.0) + (
                        _time.perf_counter() - t0
                    )
        else:
            # fused launches: ~4 ms host dispatch + tunnel round-trip per
            # launch dominate at small sizes, so run the whole plan in a
            # few compiled programs
            G = self.fuse_group
            for g in range(0, len(plan), G):
                group = plan[g : g + G]
                sig = tuple(
                    (e["ls"], e["nprims"], e["tier"],
                     ("scatter" if n_dm > 1
                      else e.get("accum", "scatter")),
                     e.get("nrows", 0), self.tile)
                    for e in group
                )
                tables_list = tuple(
                    tuple(self._tables(e["tier"])[k] for k in e["cls_idx"])
                    for e in group
                )
                tasks_list = tuple(_entry_tasks_dev(e) for e in group)
                bounds = tuple(e["bound"] for e in group)
                fn = _fused_scan_fn(sig, nao, with_j, with_k, omega,
                                    n_dm=n_dm)
                vj, vk = fn(
                    tables_list, tasks_list, dm_df, dm_f32, vj, vk, bounds
                )
        shape = (nao, nao) if n_dm == 1 else (n_dm, nao, nao)
        vj64 = df.to_f64(vj).reshape(shape) if with_j else None
        vk64 = df.to_f64(vk).reshape(shape) if with_k else None
        if has_tile:
            # fold the extended accumulators to internal AO space: one
            # exact (0/1-weighted) host f64 congruence per target
            R = self._efold()

            def fold(Ex):
                Ex = np.asarray(df.to_f64(Ex))
                if n_dm == 1:
                    return R.T @ Ex @ R
                return np.stack([R.T @ Ex[d] @ R for d in range(n_dm)])

            if with_j:
                vj64 = vj64 + fold(EJ)
            if with_k:
                vk64 = vk64 + fold(EK)
        return vj64, vk64

    def get_jk(self, dm_mol, with_j=True, with_k=True, omega=0.0, hermi=1,
               bucketed=False):
        """J/K matrices for one dm (nao, nao) or a stack (n, nao, nao).

        omega > 0 uses the long-range erf(omega*r)/r kernel
        (range-separated hybrids); the Schwarz task plan is shared with
        omega=0 (full-Coulomb q bounds upper-bound the attenuated
        integrals, so screening stays valid, slightly conservative).

        hermi=0 handles non-symmetric dm (reference: dm+dm^T stacking,
        jqc/pyscf/jk.py:189-192): J sees only the symmetric part exactly
        ((ij|kl) is k<->l symmetric); K splits as K(dm) = K(dm_s) +
        K(dm_a) where the antisymmetric part unfolds as P - P^T (the
        orbit images transpose both the dm block and the output block,
        validated against the dense oracle in tests/test_jk_engine.py).
        """
        dm = np.asarray(dm_mol, np.float64)
        if dm.ndim == 3:  # multi-dm (reference: n_dm batching)
            sym_all = hermi == 1 or all(
                np.abs(d - d.T).max() < 1e-14 * max(np.abs(d).max(), 1.0)
                for d in dm
            )
            if sym_all and self.accum != "block":
                # batched path: the ERIs of every class scan are computed
                # ONCE and contracted with all n_dm densities (reference:
                # n_dm as a kernel template arg, backend/jk_1qnt.py)
                lay = self.layout
                dms_int = np.stack([lay.dm_to_internal(d) for d in dm])
                cond = np.maximum.reduce(
                    [lay.dm_cond(d) for d in dms_int]
                )
                pj, pk = self._run_plan(
                    dms_int, with_j, with_k, float(omega or 0.0), bucketed,
                    cond=cond,
                )
                vj = (
                    np.stack([lay.mat_to_mol(v + v.T) for v in pj])
                    if with_j else None
                )
                vk = (
                    np.stack([lay.mat_to_mol(v + v.T) for v in pk])
                    if with_k else None
                )
                return vj, vk
            outs = [
                self.get_jk(d, with_j, with_k, omega, hermi, bucketed)
                for d in dm
            ]
            vj = np.stack([o[0] for o in outs]) if with_j else None
            vk = np.stack([o[1] for o in outs]) if with_k else None
            return vj, vk

        lay = self.layout
        omega = float(omega or 0.0)
        sym = hermi == 1 or np.abs(dm - dm.T).max() < 1e-14 * max(
            np.abs(dm).max(), 1.0
        )
        dms = dm if sym else 0.5 * (dm + dm.T)
        dms_int = lay.dm_to_internal(dms)
        cond = lay.dm_cond(dms_int)
        dma_int = None
        if not sym and with_k:
            dma_int = lay.dm_to_internal(0.5 * (dm - dm.T))
            # one shared density bound for both passes so the plan cache
            # is not rebuilt twice per call
            cond = np.maximum(cond, lay.dm_cond(dma_int))
        if dma_int is not None and self.accum != "block":
            # batch the symmetric and antisymmetric passes: ERIs are
            # evaluated once and contracted with both densities
            pj, pk = self._run_plan(
                np.stack([dms_int, dma_int]), with_j, True, omega,
                bucketed, cond=cond,
            )
            out_j = lay.mat_to_mol(pj[0] + pj[0].T) if with_j else None
            out_k = lay.mat_to_mol(pk[0] + pk[0].T) + lay.mat_to_mol(
                pk[1] - pk[1].T
            )
            return out_j, out_k
        vj, vk = self._run_plan(
            dms_int, with_j, with_k, omega, bucketed, cond=cond
        )
        out_j = lay.mat_to_mol(vj + vj.T) if with_j else None
        out_k = lay.mat_to_mol(vk + vk.T) if with_k else None
        if dma_int is not None:
            _, pka = self._run_plan(
                dma_int, False, True, omega, bucketed, cond=cond
            )
            out_k = out_k + lay.mat_to_mol(pka - pka.T)
        return out_j, out_k

    # ----------------------------------------------------- incremental
    def reset_incremental(self):
        """Drop cached J/K state (call when starting a new SCF)."""
        self._incr = {}

    def get_jk_incr(self, dm_mol, with_j=True, with_k=True, omega=0.0):
        """Incremental direct-SCF J/K: evaluate only on dm - dm_prev.

        J and K are LINEAR in dm, so J(dm) = J(dm_prev) + J(ddm) exactly;
        as SCF converges ||ddm|| decays, the density-weighted Schwarz
        screen drops most tasks, and the pow2-bucketed plan shapes stay
        compiled.  Reference counterpart: the incremental/direct-SCF ddm
        path (jqc/pyscf/rks.py:180-262 and PySCF direct_scf)."""
        if not hasattr(self, "_incr"):
            self._incr = {}
        key = (bool(with_j), bool(with_k), float(omega or 0.0))
        st = self._incr.get(key)
        dm = np.asarray(dm_mol, np.float64)
        if st is None:
            vj, vk = self.get_jk(dm, with_j, with_k, omega, bucketed=True)
        else:
            dvj, dvk = self.get_jk(
                dm - st["dm"], with_j, with_k, omega, bucketed=True
            )
            vj = st["vj"] + dvj if with_j else None
            vk = st["vk"] + dvk if with_k else None
        self._incr[key] = dict(dm=dm.copy(), vj=vj, vk=vk)
        return vj, vk


@lru_cache(maxsize=None)
def _q_diag_fn(ls, nprims, omega=0.0):
    """f32 Schwarz diagonal q^2 = max |(ab|ab)_omega| per pair (jitted)."""

    def fn(tb1, tb2, i, j):
        geom = {}
        for name, tbl, idx in zip("abcd", (tb1, tb2, tb1, tb2), (i, j, i, j)):
            coord, exps, coefs, _ = tbl
            geom[f"coord_{name}"] = jnp.take(coord, idx, axis=0)
            geom[f"exps_{name}"] = jnp.take(exps, idx, axis=0)
            geom[f"coefs_{name}"] = jnp.take(coefs, idx, axis=0)
        G = contracted_eri_batch("f32", ls, nprims, geom, omega)
        diag = jnp.abs(jnp.diagonal(G, axis1=1, axis2=2))
        return jnp.max(diag, axis=1)

    return jax.jit(fn)


__all__ = ["JKEngine"]
