"""Mixed fp32/DF64 precision for grid numerical integration (dense path).

Reference counterpart: the per-pair precision windows of eval_rho /
eval_vxc (/root/reference/jqc/backend/dft/eval_rho.cu:93-106) and the
dual fp64-then-fp32 kernel launches (/root/reference/jqc/pyscf/rks.py:
446-493).  TPU-native redesign (TPUs have no native f64):

 - the fp32 bulk runs the existing dense MXU path (dft/numint.py);
 - the AO pairs whose magnitude bound exceeds ``cutoff_fp64`` are
   re-evaluated in compensated double-float (DF64) on the VPU,
   vectorized over a static padded pair list;
 - rho combines the tiers EXCLUSIVELY (the density matrix is split
   dm = dm_heavy + dm_light; each tier sees only its half -- J/rho are
   linear in dm, so the split is exact);
 - the V_xc matrix combines by ENTRY OVERWRITE (matrix elements are
   independent outputs: heavy entries take the DF64 value, light ones
   keep the f32-accumulated value).

Pair selection uses analytic global AO bounds
   max_r |c r^l e^{-e r^2}| = |c| (l/2e)^{l/2} e^{-l/2}
per shell (plus the dm block / integrated |wv| factor), mirroring the
reference's log-window routing on log(ao_i ao_j dm).
"""

from __future__ import annotations

import os
from functools import lru_cache

import numpy as np

import jax
import jax.numpy as jnp

from ..ops import df64 as df
from ..ops.harmonics import cart_components
from .numint import NumInt, _blocked, _family_arg


def shell_value_bound(l: int, exps, coefs) -> float:
    """Global bound on |contracted radial x r^l| over all r."""
    exps = np.asarray(exps, float)
    coefs = np.asarray(coefs, float)
    if l == 0:
        per = np.abs(coefs)
    else:
        per = np.abs(coefs) * (l / (2.0 * exps)) ** (l / 2.0) * np.exp(-l / 2.0)
    return float(per.sum())


def _ao_bounds(layout):
    """log global |AO| bound per shell (nbas,)."""
    out = np.empty(layout.nbas)
    for i, sh in enumerate(layout.mol.shells):
        out[i] = np.log(max(shell_value_bound(sh.l, sh.exps, sh.coeffs), 1e-300))
    return out


def heavy_shell_pairs(layout, weight_log, cutoff: float):
    """Shell pairs (I >= J) with aoB_I + aoB_J + weight_log_IJ > log cut.

    ``weight_log``: (nbas, nbas) log-magnitude of the pairing weight
    (log |dm| block bound for rho; log integrated |wv| for vxc)."""
    aoB = _ao_bounds(layout)
    bound = aoB[:, None] + aoB[None, :] + weight_log
    ii, jj = np.nonzero(np.tril(bound > np.log(cutoff)))
    return ii.astype(np.int32), jj.astype(np.int32)


def _pair_pack(layout, ish, jsh):
    """Expand heavy shell pairs to ORDERED AO-level pair arrays.

    Returns dict of per-pair arrays: centers/exponents/coefficients and
    cartesian powers for both AOs, plus flat AO indices (ai, aj)."""
    mol = layout.mol
    kmax = max(sh.nprim for sh in mol.shells)
    rows = []
    for I, J in zip(ish, jsh):
        orders = [(I, J)] if I == J else [(I, J), (J, I)]
        for a, b in orders:
            sa, sb = mol.shells[a], mol.shells[b]
            oa, ob = layout.ao_loc_int[a], layout.ao_loc_int[b]
            for fa, pa in enumerate(cart_components(sa.l)):
                for fb, pb in enumerate(cart_components(sb.l)):
                    rows.append((a, b, oa + fa, ob + fb, pa, pb))
    P = len(rows)
    Pp = 1 << int(np.ceil(np.log2(max(P, 8))))
    d = dict(
        coord_a=np.zeros((Pp, 3)), coord_b=np.zeros((Pp, 3)),
        exps_a=np.ones((Pp, kmax)), exps_b=np.ones((Pp, kmax)),
        coefs_a=np.zeros((Pp, kmax)), coefs_b=np.zeros((Pp, kmax)),
        pw_a=np.zeros((Pp, 3), np.int32), pw_b=np.zeros((Pp, 3), np.int32),
        ai=np.full(Pp, -1, np.int32), aj=np.full(Pp, -1, np.int32),
    )
    for p, (a, b, ai, aj, pa, pb) in enumerate(rows):
        sa, sb = mol.shells[a], mol.shells[b]
        d["coord_a"][p] = sa.coord
        d["coord_b"][p] = sb.coord
        d["exps_a"][p, : sa.nprim] = sa.exps
        d["coefs_a"][p, : sa.nprim] = sa.coeffs
        d["exps_b"][p, : sb.nprim] = sb.exps
        d["coefs_b"][p, : sb.nprim] = sb.coeffs
        d["pw_a"][p] = pa
        d["pw_b"][p] = pb
        d["ai"][p] = ai
        d["aj"][p] = aj
    d["n"] = P
    return d


_LMAXP1 = 5  # power table depth: monomials up to l=4


def _ao_df64(grid, coord, exps, coefs, pw, deriv):
    """DF64 AO values (and gradient) for one pair-center column set.

    grid: (G, 3) DF64; coord (P,3), exps/coefs (P,K) DF64; pw (P,3) i32.
    Returns (ao, [dx, dy, dz]) each DF64 (G, P)."""
    G = grid.hi.shape[0]
    P = coord.hi.shape[0]

    def axis(i):
        return df.DF64(grid.hi[:, None, i], grid.lo[:, None, i])

    rel = []
    for i in range(3):
        ci = df.DF64(coord.hi[None, :, i], coord.lo[None, :, i])
        rel.append(df.add(axis(i), df.neg(ci)))  # (G, P)
    r2 = df.add(df.add(df.mul(rel[0], rel[0]), df.mul(rel[1], rel[1])),
                df.mul(rel[2], rel[2]))

    rad = df.const(0.0, (G, P))
    drad = df.const(0.0, (G, P))
    K = exps.hi.shape[1]
    for k in range(K):
        e = df.DF64(exps.hi[None, :, k], exps.lo[None, :, k])
        c = df.DF64(coefs.hi[None, :, k], coefs.lo[None, :, k])
        ex = df.exp(df.neg(df.mul(e, r2)))
        rad = df.add(rad, df.mul(c, ex))
        drad = df.add(drad, df.mul(df.mul_f32(df.mul(c, e), -2.0), ex))

    # power tables x^i for i = 0..4 -> gather by per-pair exponent
    def pows(v):
        cur = df.const(1.0, (G, P))
        his, los = [cur.hi], [cur.lo]
        for _ in range(_LMAXP1 - 1):
            cur = df.mul(cur, v)
            his.append(cur.hi)
            los.append(cur.lo)
        return df.DF64(jnp.stack(his, -1), jnp.stack(los, -1))  # (G,P,5)

    ptabs = [pows(rel[i]) for i in range(3)]

    def take_pow(i_axis, n):  # n: (P,) i32 -> (G, P) DF64
        idx = jnp.broadcast_to(n[None, :, None], (G, P, 1))
        t = ptabs[i_axis]
        return df.DF64(
            jnp.take_along_axis(t.hi, idx, axis=2)[..., 0],
            jnp.take_along_axis(t.lo, idx, axis=2)[..., 0],
        )

    mono = df.mul(
        df.mul(take_pow(0, pw[:, 0]), take_pow(1, pw[:, 1])),
        take_pow(2, pw[:, 2]),
    )
    ao = df.mul(rad, mono)
    if deriv == 0:
        return ao, None

    grads = []
    for d3 in range(3):
        t1 = df.mul(df.mul(drad, rel[d3]), mono)
        n = pw[:, d3]
        # monomial with the d3 power lowered by one (clamped at zero; the
        # explicit n factor kills the n == 0 case)
        pws = [pw[:, 0], pw[:, 1], pw[:, 2]]
        pws[d3] = jnp.maximum(pws[d3] - 1, 0)
        lower = df.mul(
            df.mul(take_pow(0, pws[0]), take_pow(1, pws[1])),
            take_pow(2, pws[2]),
        )
        t2 = df.mul_f32(
            df.mul(rad, lower), n[None, :].astype(jnp.float32)
        )
        grads.append(df.add(t1, t2))
    return ao, grads


@lru_cache(maxsize=None)
def _rho_heavy_fn(nblk, P, K, family):
    deriv = 0 if family == "lda" else 1

    def fn(blocks, pack, dmp):
        def body(_, blk):
            ao_a, g_a = _ao_df64(blk, pack["coord_a"], pack["exps_a"],
                                 pack["coefs_a"], pack["pw_a"], deriv)
            ao_b, g_b = _ao_df64(blk, pack["coord_b"], pack["exps_b"],
                                 pack["coefs_b"], pack["pw_b"], deriv)
            pair = df.mul(ao_a, ao_b)
            rows = [df.dfsum(df.mul(pair, dmp), axis=1)]
            if family != "lda":
                for d3 in range(3):
                    gterm = df.add(
                        df.mul(g_a[d3], ao_b), df.mul(ao_a, g_b[d3])
                    )
                    rows.append(df.dfsum(df.mul(gterm, dmp), axis=1))
            if family == "mgga":
                tau = df.const(0.0, rows[0].hi.shape)
                for d3 in range(3):
                    tau = df.add(
                        tau,
                        df.dfsum(df.mul(df.mul(g_a[d3], g_b[d3]), dmp), axis=1),
                    )
                rows.append(df.mul_f32(tau, 0.5))
            return None, df.DF64(
                jnp.stack([r.hi for r in rows]), jnp.stack([r.lo for r in rows])
            )

        _, out = jax.lax.scan(body, None, blocks)
        return out  # DF64 (nblk, rows, G)

    return jax.jit(fn)


@lru_cache(maxsize=None)
def _vxc_heavy_fn(nblk, P, K, family):
    deriv = 0 if family == "lda" else 1

    def fn(blocks, wvb, pack):
        def body(acc, x):
            blk, wv = x  # wv: DF64 (rows, G)
            ao_a, g_a = _ao_df64(blk, pack["coord_a"], pack["exps_a"],
                                 pack["coefs_a"], pack["pw_a"], deriv)
            ao_b, g_b = _ao_df64(blk, pack["coord_b"], pack["exps_b"],
                                 pack["coefs_b"], pack["pw_b"], deriv)

            def wrow(i):  # (G, 1) DF64 broadcast column
                return df.DF64(wv.hi[i][:, None], wv.lo[i][:, None])

            term = df.mul(df.mul(ao_a, ao_b), wrow(0))
            if family != "lda":
                for d3 in range(3):
                    gterm = df.add(
                        df.mul(g_a[d3], ao_b), df.mul(ao_a, g_b[d3])
                    )
                    term = df.add(term, df.mul(gterm, wrow(1 + d3)))
            if family == "mgga":
                gg = df.const(0.0, term.hi.shape)
                for d3 in range(3):
                    gg = df.add(gg, df.mul(g_a[d3], g_b[d3]))
                term = df.add(term, df.mul_f32(df.mul(gg, wrow(4)), 0.5))
            return df.add(acc, df.dfsum(term, axis=0)), None

        acc0 = df.const(0.0, (P,))
        acc, _ = jax.lax.scan(body, acc0, (blocks, wvb))
        return acc

    return jax.jit(fn)


# Heavy-pair launches are chunked along the PAIR axis: the per-block
# intermediates are (G, P) DF64 arrays, and one launch over an unchunked
# pack blows up at molecule scale (observed: a 131k-pair pack at 302 AO
# compiled a 64 GB allocation and aborted).  8192 pairs x 1024 points
# keeps every intermediate ~64 MB; rho chunks add, vxc chunks concat.
_PAIR_CHUNK = int(os.environ.get("JQC_MIXED_PAIR_CHUNK", "8192"))
# grid blocks per heavy-tier launch (same transient-size rationale)
_BLOCK_CHUNK = int(os.environ.get("JQC_MIXED_BLOCK_CHUNK", "64"))


def _pack_slices(pack, pc):
    """Split a pow2-padded pair pack into pow2 sub-packs of <= pc rows."""
    P = len(pack["ai"])
    if P <= pc:
        return [pack]
    return [
        {
            k: (v[s : s + pc] if isinstance(v, np.ndarray) else v)
            for k, v in pack.items()
        }
        for s in range(0, P, pc)
    ]


def _pack_dev(pack):
    return dict(
        coord_a=df.from_f64(pack["coord_a"]),
        coord_b=df.from_f64(pack["coord_b"]),
        exps_a=df.from_f64(pack["exps_a"]),
        exps_b=df.from_f64(pack["exps_b"]),
        coefs_a=df.from_f64(pack["coefs_a"]),
        coefs_b=df.from_f64(pack["coefs_b"]),
        pw_a=jnp.asarray(pack["pw_a"]),
        pw_b=jnp.asarray(pack["pw_b"]),
    )


def eval_rho_mixed(ni: NumInt, grids, dm_int, family, layout,
                   cutoff_fp64: float = 1e-6, block_sel=None, bulk=None):
    """rho rows with fp32 bulk + DF64 heavy-pair tier.

    ``bulk``: optional f32 bulk evaluator ``bulk(dm, block_sel) -> rho``
    (defaults to the dense MXU path; the RKS driver passes the screened
    sparse evaluator here so mixed precision composes with AO screening,
    matching the reference's nz-list + precision-window composition,
    /root/reference/jqc/backend/dft/eval_rho.cu:93-106)."""
    from .numint import _select_blocks, eval_rho_all

    family = _family_arg(family)
    if bulk is None:
        def bulk(d, sel):
            return eval_rho_all(ni, grids, d, family, block_sel=sel)

    D = layout.dm_cond(dm_int)
    wlog = np.log(np.maximum(D, 1e-300))
    ish, jsh = heavy_shell_pairs(layout, wlog, cutoff_fp64)
    if len(ish) == 0:
        return bulk(dm_int, block_sel)

    # exclusive split of the density matrix over AO index blocks
    mask = np.zeros_like(dm_int, dtype=bool)
    al = layout.ao_loc_int
    for I, J in zip(ish, jsh):
        mask[al[I]:al[I + 1], al[J]:al[J + 1]] = True
        mask[al[J]:al[J + 1], al[I]:al[I + 1]] = True
    rho = bulk(np.where(mask, 0.0, dm_int), block_sel)

    pack = _pair_pack(layout, ish, jsh)
    dmp = np.zeros(len(pack["ai"]))
    sel = pack["ai"] >= 0
    dmp[sel] = dm_int[pack["ai"][sel], pack["aj"][sel]]
    blocks, N = _blocked(grids.coords, ni.block)
    sub = blocks if block_sel is None else _select_blocks(blocks, block_sel)
    # chunk the grid-block axis as well: a single launch scanning many
    # hundreds of blocks held multi-GB transients and crashed the TPU
    # worker at 0029 scale (round 5); pad the last slice so only one
    # program shape compiles per (pair-chunk, family) signature
    nb = _BLOCK_CHUNK
    heavy = None
    for s, sp in enumerate(_pack_slices(pack, _PAIR_CHUNK)):
        dmp_s = dmp[s * _PAIR_CHUNK : s * _PAIR_CHUNK + len(sp["ai"])]
        dmp_df = df.from_f64(dmp_s)
        dmp_df = df.DF64(dmp_df.hi[None, :], dmp_df.lo[None, :])
        pk_dev = _pack_dev(sp)
        parts = []
        for b0 in range(0, len(sub), nb):
            sl = sub[b0 : b0 + nb]
            npad = min(nb, len(sub)) - len(sl)
            if npad:
                sl = np.concatenate([sl, np.zeros((npad,) + sl.shape[1:])])
            fn = _rho_heavy_fn(
                len(sl), len(dmp_s), sp["exps_a"].shape[1], family
            )
            out = np.asarray(df.to_f64(fn(df.from_f64(sl), pk_dev, dmp_df)))
            parts.append(out[: len(sl) - npad])
        part = np.concatenate(parts)  # (nsub, rows, G)
        heavy = part if heavy is None else heavy + part
    rows = heavy.shape[1]
    B = ni.block
    full = np.zeros((rows, len(blocks) * B))
    targets = (
        range(len(blocks)) if block_sel is None else list(block_sel)
    )
    for k, b in enumerate(targets):
        full[:, b * B : (b + 1) * B] = heavy[k]
    return rho + full[:, :N]


def eval_vxc_mixed(ni: NumInt, grids, wv, family, layout,
                   cutoff_fp64: float = 1e-6, block_sel=None, bulk=None):
    """V_xc with fp32 bulk + DF64 overwrite of heavy entries.

    ``bulk``: optional f32 bulk evaluator ``bulk(wv, block_sel) -> mat``
    (defaults dense; the RKS driver passes the screened evaluator)."""
    from .numint import _select_blocks, eval_vxc_mat

    family = _family_arg(family)
    if bulk is None:
        mat = eval_vxc_mat(ni, grids, wv, family, block_sel=block_sel)
    else:
        mat = bulk(wv, block_sel)
    # pairing weight: integrated |wv| (the sum the matrix element sees)
    wsum = float(np.sum(np.abs(wv))) + 1e-300
    wlog = np.full((layout.nbas, layout.nbas), np.log(wsum))
    ish, jsh = heavy_shell_pairs(layout, wlog, cutoff_fp64)
    if len(ish) == 0:
        return mat

    pack = _pair_pack(layout, ish, jsh)
    B = ni.block
    blocks, N = _blocked(grids.coords, B)
    nblk = len(blocks)
    rows = wv.shape[0]
    wvp = np.zeros((rows, nblk * B))
    wvp[:, :N] = wv[:, :N]
    wv_blocks = wvp.reshape(rows, nblk, B).transpose(1, 0, 2)
    if block_sel is not None:
        sub = _select_blocks(blocks, block_sel)
        wv_sub = wv_blocks[block_sel]
        npad = len(sub) - len(wv_sub)
        if npad:
            wv_sub = np.concatenate(
                [wv_sub, np.zeros((npad,) + wv_sub.shape[1:])]
            )
        blocks, wv_blocks = sub, wv_sub
    nb = _BLOCK_CHUNK
    nblk_pad = min(nb, len(blocks))
    parts = []
    for sp in _pack_slices(pack, _PAIR_CHUNK):
        pk_dev = _pack_dev(sp)
        fn = _vxc_heavy_fn(
            nblk_pad, len(sp["ai"]), sp["exps_a"].shape[1], family
        )
        acc = None
        for b0 in range(0, len(blocks), nb):
            bl = blocks[b0 : b0 + nb]
            wl = wv_blocks[b0 : b0 + nb]
            npad = nblk_pad - len(bl)
            if npad:
                bl = np.concatenate([bl, np.zeros((npad,) + bl.shape[1:])])
                wl = np.concatenate([wl, np.zeros((npad,) + wl.shape[1:])])
            out = np.asarray(
                df.to_f64(fn(df.from_f64(bl), df.from_f64(wl), pk_dev))
            )
            acc = out if acc is None else acc + out
        parts.append(acc)
    vals = np.concatenate(parts)
    sel = pack["ai"] >= 0
    mat[pack["ai"][sel], pack["aj"][sel]] = vals[sel]
    return mat


__all__ = [
    "eval_rho_mixed",
    "eval_vxc_mixed",
    "heavy_shell_pairs",
    "shell_value_bound",
]
