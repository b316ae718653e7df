"""Pair-based Coulomb (J) engine: Hermite-density contraction.

Reference counterpart: the experimental pair-based VJ algorithm
(/root/reference/jqc/backend/jk_pair.py + jk/pair_vj.cu: one thread per
ij-pair with kl-pair blocks staged through shared memory).  TPU-native
redesign exploiting the McMurchie-Davidson factorization:

    J_ab = sum_t E^ab_t  JH[P_ab, t]
    JH[P, t] = sum_Q pref(P,Q) sum_u (-1)^|u| R_{t+u}(P-Q) D[Q, u]
    D[Q, u]  = sum_cd E^cd_u dm_cd          (Hermite-space density)

The E tensors are computed ONCE PER PRIMITIVE PAIR (stages A/C) instead
of once per shell quartet, and the per-task work collapses from the
full (nf_ab x nf_cd x contraction-depth^4) cartesian block to an
NT_ab x NT_cd Hermite matrix-vector product -- the right algorithm when
only J is needed (pure-functional DFT), exactly why the reference keeps
a pair path.  K cannot use this factorization and stays on the quartet
engine (scf/jk_contracted.py).

Symmetry conventions: pair lists are unordered (i >= j) with the
off-diagonal x2 dm weight folded into D; each screened (bra-pair,
ket-pair) task contributes BOTH directions (forward to the bra's JH,
reverse to the ket's), with 0.5 weight when bra==ket; output blocks are
scattered once per pair (0.5 on shell-diagonal pairs) and symmetrized
by a final V + V^T.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from ..mol.layout import BasisLayout
from ..ops import df64 as df
from ..ops.accum import limbs_to_df64, scatter_limbs
from ..ops.arith import get_arith
from ..ops.harmonics import cart_components
from ..ops.md import (
    coupling_index,
    e_tensor,
    ket_signs,
    make_pair_data,
    r_tensor_stacked,
    stack_e_pairs,
    tri_set,
)
from .jk_contracted import _take, _chunk_size
from .tasks import (
    build_pair_classes,
    build_quartet_tasks,
    build_shell_classes,
    sort_pairs_by_q,
)

import math


def _nt(l):
    return len(tri_set(l)[0])


def _nf(l):
    return len(cart_components(l))


# ------------------------------------------------------------- stage A
@lru_cache(maxsize=None)
def _stageA_fn(l1, l2, np1, np2, tier, nao):
    """Per-pair Hermite density + primitive-pair auxiliaries (jitted).

    fn(tables1, tables2, iloc, jloc, wpair, dm) ->
      (p (P, npp), center (P, npp, 3), coef (P, npp), D (P, npp, NT))
    All outputs ar-native; wpair folds the x2 off-diagonal dm weight.
    """
    ar = get_arith(tier)
    lab = l1 + l2
    NT = _nt(lab)
    nf12 = _nf(l1) * _nf(l2)
    npp = np1 * np2
    pa_idx = np.repeat(np.arange(np1), np2)
    pb_idx = np.tile(np.arange(np2), np1)

    def fn(tb1, tb2, iloc, jloc, wpair, dm):
        c1_coord, c1_exps, c1_coefs, c1_ao = tb1
        c2_coord, c2_exps, c2_coefs, c2_ao = tb2
        A = _take(c1_coord, iloc)
        B = _take(c2_coord, jloc)
        ea = _take(c1_exps, iloc)
        eb = _take(c2_exps, jloc)
        ca = _take(c1_coefs, iloc)
        cb = _take(c2_coefs, jloc)
        ao_a = jnp.take(c1_ao, iloc)
        ao_b = jnp.take(c2_ao, jloc)
        # dm block per pair: (P, nf12)
        nfa, nfb = _nf(l1), _nf(l2)
        idx = (
            (ao_a[:, None, None] + jnp.arange(nfa)[None, :, None]) * nao
            + ao_b[:, None, None]
            + jnp.arange(nfb)[None, None, :]
        ).reshape(-1, nf12)
        if tier in ("df64", "fp64"):
            dmv = df.DF64(
                jnp.take(dm.hi.reshape(-1), idx), jnp.take(dm.lo.reshape(-1), idx)
            )
        else:
            dmv = jnp.take(dm.reshape(-1), idx)
        dmv = ar.mul_f32(dmv, wpair[:, None])

        ps, centers, coefs, Ds = [], [], [], []
        for k in range(npp):
            a = _col(ar, ea, int(pa_idx[k]))
            b = _col(ar, eb, int(pb_idx[k]))
            cc = ar.mul(_col(ar, ca, int(pa_idx[k])), _col(ar, cb, int(pb_idx[k])))
            pd = make_pair_data(ar, A, B, a, b, cc)
            inv2p = ar.scale_pow2(ar.recip(pd["p"]), 0.5)
            E = stack_e_pairs(
                ar, l1, l2,
                e_tensor(ar, l1, l2, inv2p, pd["xpa"], pd["xpb"], pd["epref"]),
            )  # (P, nf12, NT)
            # D_u = sum_f dm_f E[f, u]
            if tier in ("df64", "fp64"):
                Dk = ar.bmm(
                    df.DF64(dmv.hi[:, None, :], dmv.lo[:, None, :]), E
                )
                Dk = df.DF64(Dk.hi[:, 0, :], Dk.lo[:, 0, :])
            else:
                Dk = ar.bmm(dmv[:, None, :], E)[:, 0, :]
            ps.append(pd["p"])
            centers.append(pd["P"])
            coefs.append(pd["coef"])
            Ds.append(Dk)
        return (
            _stack(ar, ps, 1),
            _stack(ar, centers, 1),
            _stack(ar, coefs, 1),
            _stack(ar, Ds, 1),
        )

    return jax.jit(fn)


def _col(ar, x, i):
    if isinstance(x, df.DF64):
        return df.DF64(x.hi[:, i], x.lo[:, i])
    return x[:, i]


def _stack(ar, xs, axis):
    if isinstance(xs[0], df.DF64):
        return df.DF64(
            jnp.stack([x.hi for x in xs], axis), jnp.stack([x.lo for x in xs], axis)
        )
    return jnp.stack(xs, axis)


# ------------------------------------------------------------- stage B
@lru_cache(maxsize=None)
def _stageB_fn(lab, lcd, nppb, nppk, tier, sizeb, sizek):
    """Task scan: accumulate Hermite-J for both sides (jitted).

    fn(auxb, auxk, tasks, jhb, jhk) -> (jhb, jhk) where aux =
    (p, center, coef, D) from stage A (per pair x prim-combo), tasks =
    (t1, t2, w) chunked (nchunk, B), jh* DF64 flat accumulators of size
    P*npp*NT (per pair AND prim combo -- the E application in stage C is
    combo-specific)."""
    ar = get_arith(tier)
    NTb, NTk = _nt(lab), _nt(lcd)
    L = lab + lcd
    idxM = coupling_index(lab, lcd)  # (NTb, NTk)
    sgn_k = ket_signs(lcd)  # (NTk,)
    pref_c = 2.0 * math.pi ** 2.5

    def fn(auxb, auxk, tasks, jhb, jhk):
        pb, Cb, cb, Db = auxb
        pk, Ck, ck, Dk = auxk

        def chunk(carry, t):
            jhb, jhk = carry
            t1, t2, w = t
            B = t1.shape[0]
            vb, ib_idx, vk, ik_idx = [], [], [], []
            for ib in range(nppb):
                pdb = _gat(ar, pb, t1, ib)
                Cbt = _gat(ar, Cb, t1, ib)
                cbt = _gat(ar, cb, t1, ib)
                Dbt = _gat(ar, Db, t1, ib)
                for ik in range(nppk):
                    pkt = _gat(ar, pk, t2, ik)
                    Ckt = _gat(ar, Ck, t2, ik)
                    ckt = _gat(ar, ck, t2, ik)
                    Dkt = _gat(ar, Dk, t2, ik)
                    psum = ar.add(pdb, pkt)
                    theta = ar.div(ar.mul(pdb, pkt), psum)
                    PQ = ar.sub(Cbt, Ckt)
                    r2 = _sumsq(ar, PQ)
                    boys = ar.boys(L, ar.mul(theta, r2))
                    RS = r_tensor_stacked(ar, L, theta, PQ, boys)  # (B, NR)
                    M = ar.take(RS, idxM.reshape(-1), axis=-1)
                    M = M.reshape(B, NTb, NTk)
                    pref = ar.mul(
                        ar.const(pref_c, ar.hi(pdb).shape),
                        ar.recip(ar.mul(ar.mul(pdb, pkt), ar.sqrt(psum))),
                    )
                    pref = ar.mul(pref, ar.mul(cbt, ckt))
                    prefw = ar.mul_f32(pref, w)
                    # forward: fwd[t] = sum_u M[t,u] sgn_u D_k[u]
                    Dks = ar.mul_f32(Dkt, sgn_k[None, :])
                    fwd = ar.mul(_mv(ar, M, Dks), prefw[..., None])
                    vb.append(_flat(fwd))
                    ib_idx.append(
                        ((t1 * nppb + ib) * NTb)[:, None]
                        + jnp.arange(NTb)[None, :]
                    )
                    # reverse: rev[u] = sgn_u sum_t M[t,u] D_b[t]
                    rev = ar.mul_f32(_vm(ar, Dbt, M), sgn_k[None, :])
                    rev = ar.mul(rev, prefw[..., None])
                    vk.append(_flat(rev))
                    ik_idx.append(
                        ((t2 * nppk + ik) * NTk)[:, None]
                        + jnp.arange(NTk)[None, :]
                    )
            limbs, sexp = scatter_limbs(
                _cat(vb), jnp.concatenate([i.reshape(-1) for i in ib_idx]), sizeb
            )
            jhb = df.add(jhb, limbs_to_df64(limbs, sexp))
            limbs, sexp = scatter_limbs(
                _cat(vk), jnp.concatenate([i.reshape(-1) for i in ik_idx]), sizek
            )
            jhk = df.add(jhk, limbs_to_df64(limbs, sexp))
            return (jhb, jhk), None

        (jhb2, jhk2), _ = jax.lax.scan(chunk, (jhb, jhk), tasks)
        return jhb2, jhk2

    return jax.jit(fn, donate_argnums=(3, 4))


# ------------------------------------------------------------- stage C
@lru_cache(maxsize=None)
def _stageC_fn(l1, l2, np1, np2, tier, nao):
    """Apply bra E tensors: vj[ao block] += sum_t E^ab_t JH[pair, combo, t].

    fn(tb1, tb2, tasks, jh, vj) -> vj; tasks = (iloc, jloc, wdiag) chunked
    (nchunk, B); jh DF64 flat (P*npp*NT); vj DF64 flat (nao*nao)."""
    ar = get_arith(tier)
    lab = l1 + l2
    NT = _nt(lab)
    nfa, nfb = _nf(l1), _nf(l2)
    nf12 = nfa * nfb
    npp = np1 * np2
    pa_idx = np.repeat(np.arange(np1), np2)
    pb_idx = np.tile(np.arange(np2), np1)
    isdf = tier in ("df64", "fp64")

    def fn(tb1, tb2, tasks, jh, vj):
        c1_coord, c1_exps, c1_coefs, c1_ao = tb1
        c2_coord, c2_exps, c2_coefs, c2_ao = tb2
        jh3 = df.DF64(jh.hi.reshape(-1, npp, NT), jh.lo.reshape(-1, npp, NT))

        def chunk(vj, t):
            pidx, iloc, jloc, wd = t
            B = iloc.shape[0]
            A = _take(c1_coord, iloc)
            Bc = _take(c2_coord, jloc)
            ea = _take(c1_exps, iloc)
            eb = _take(c2_exps, jloc)
            ao_a = jnp.take(c1_ao, iloc)
            ao_b = jnp.take(c2_ao, jloc)
            blk = ar.zeros((B, nf12))
            for k in range(npp):
                a = _col(ar, ea, int(pa_idx[k]))
                b = _col(ar, eb, int(pb_idx[k]))
                one = ar.const(1.0, ar.hi(a).shape)
                pd = make_pair_data(ar, A, Bc, a, b, one)
                inv2p = ar.scale_pow2(ar.recip(pd["p"]), 0.5)
                E = stack_e_pairs(
                    ar, l1, l2,
                    e_tensor(
                        ar, l1, l2, inv2p, pd["xpa"], pd["xpb"], pd["epref"]
                    ),
                )  # (B, nf12, NT)
                jhk = df.DF64(jh3.hi[pidx, k], jh3.lo[pidx, k])  # (B, NT)
                if not isdf:
                    jhk = jhk.hi + jhk.lo
                blk = ar.add(blk, _mv(ar, E, _as_ar(ar, jhk)))
            blk = ar.mul_f32(blk, wd[:, None])
            idx = (
                (ao_a[:, None, None] + jnp.arange(nfa)[None, :, None]) * nao
                + ao_b[:, None, None]
                + jnp.arange(nfb)[None, None, :]
            ).reshape(-1)
            limbs, sexp = scatter_limbs(_flat(blk), idx, nao * nao)
            return df.add(vj, limbs_to_df64(limbs, sexp)), None

        vj, _ = jax.lax.scan(chunk, vj, tasks)
        return vj

    return jax.jit(fn, donate_argnums=(4,))


def _as_ar(ar, x):
    if ar.dtype == "df64":
        return x if isinstance(x, df.DF64) else df.from_f32(x)
    return x if not isinstance(x, df.DF64) else x.hi + x.lo


def _flat(x):
    if isinstance(x, df.DF64):
        return df.DF64(x.hi.reshape(-1), x.lo.reshape(-1))
    return x.reshape(-1)


def _cat(parts):
    if isinstance(parts[0], df.DF64):
        return df.DF64(
            jnp.concatenate([p.hi for p in parts]),
            jnp.concatenate([p.lo for p in parts]),
        )
    return jnp.concatenate(parts)


def _gat(ar, x, idx, k):
    if isinstance(x, df.DF64):
        return df.DF64(x.hi[idx, k], x.lo[idx, k])
    return x[idx, k]


def _sumsq(ar, v):
    x, y, z = _colv(ar, v, 0), _colv(ar, v, 1), _colv(ar, v, 2)
    return ar.add(ar.add(ar.mul(x, x), ar.mul(y, y)), ar.mul(z, z))


def _colv(ar, x, i):
    if isinstance(x, df.DF64):
        return df.DF64(x.hi[..., i], x.lo[..., i])
    return x[..., i]


def _mv(ar, M, v):
    """(B, m, n) @ (B, n) -> (B, m)."""
    if isinstance(M, df.DF64):
        out = ar.bmm(M, df.DF64(v.hi[:, :, None], v.lo[:, :, None]))
        return df.DF64(out.hi[:, :, 0], out.lo[:, :, 0])
    return ar.bmm(M, v[:, :, None])[:, :, 0]


def _vm(ar, v, M):
    """(B, m) @ (B, m, n) -> (B, n)."""
    if isinstance(M, df.DF64):
        out = ar.bmm(df.DF64(v.hi[:, None, :], v.lo[:, None, :]), M)
        return df.DF64(out.hi[:, 0, :], out.lo[:, 0, :])
    return ar.bmm(v[:, None, :], M)[:, 0, :]


# ------------------------------------------------------------- pair VK
def _rs(x, shape):
    if isinstance(x, df.DF64):
        return df.DF64(x.hi.reshape(shape), x.lo.reshape(shape))
    return x.reshape(shape)


def _t12(x):
    """Transpose the last two axes (ar-native)."""
    if isinstance(x, df.DF64):
        return df.DF64(
            jnp.swapaxes(x.hi, -1, -2), jnp.swapaxes(x.lo, -1, -2)
        )
    return jnp.swapaxes(x, -1, -2)


@lru_cache(maxsize=None)
def _vk_fn(l1, l2, l3, l4, np1, np2, np3, np4, tier, nao):
    """Pair-algorithm exchange kernel (jitted class scan).

    Reference counterpart: the experimental pair-based VK kernel
    (/root/reference/jqc/backend/jk/pair_vk.cu:83 +
    backend/jk_pair.py:372 -- 16x16 thread blocks over (ij-pair,
    kl-pair) tiles contracting ERIs with dm on the fly).  TPU redesign:
    the ERI block of each (bra-pair, ket-pair) task factors through the
    Hermite E tensors,

        G(ab,cd) = E_bra (nf12 x NTb) @ M (NTb x NTk) @ E_ket^T,

    three MXU batched matmuls per primitive-pair combo instead of the
    scalar McMurchie-Davidson quartet chain of the contracted engine
    (ops/eri.py) -- the pair path trades more Hermite->cartesian matmul
    work for zero contraction depth in the class key.  K contraction and
    symmetry conventions match scf/jk_contracted.py exactly
    (weighted-orbit sum, final V + V^T unfold by the caller)."""
    from .jk_contracted import _contract_blocks

    ar = get_arith(tier)
    lab, lcd = l1 + l2, l3 + l4
    NTb, NTk = _nt(lab), _nt(lcd)
    L = lab + lcd
    idxM = coupling_index(lab, lcd)  # (NTb, NTk)
    sgn_k = ket_signs(lcd)  # (NTk,)
    pref_c = 2.0 * math.pi ** 2.5
    nfs = (_nf(l1), _nf(l2), _nf(l3), _nf(l4))
    nf12, nf34 = nfs[0] * nfs[1], nfs[2] * nfs[3]
    pa1 = np.repeat(np.arange(np1), np2)
    pb1 = np.tile(np.arange(np2), np1)
    pa2 = np.repeat(np.arange(np3), np4)
    pb2 = np.tile(np.arange(np4), np3)

    def fn(tb1, tb2, tb3, tb4, tasks, dm, vk):
        c1_coord, c1_exps, c1_coefs, c1_ao = tb1
        c2_coord, c2_exps, c2_coefs, c2_ao = tb2
        c3_coord, c3_exps, c3_coefs, c3_ao = tb3
        c4_coord, c4_exps, c4_coefs, c4_ao = tb4

        def chunk(vk, t):
            il1, jl1, il2, jl2, w = t
            B = il1.shape[0]
            A = _take(c1_coord, il1)
            Bc = _take(c2_coord, jl1)
            C = _take(c3_coord, il2)
            D = _take(c4_coord, jl2)
            ea, ca = _take(c1_exps, il1), _take(c1_coefs, il1)
            eb, cb = _take(c2_exps, jl1), _take(c2_coefs, jl1)
            ec, cc = _take(c3_exps, il2), _take(c3_coefs, il2)
            ed, cd = _take(c4_exps, jl2), _take(c4_coefs, jl2)
            aos = (
                jnp.take(c1_ao, il1),
                jnp.take(c2_ao, jl1),
                jnp.take(c3_ao, il2),
                jnp.take(c4_ao, jl2),
            )
            # primitive-pair combos run under lax.scan (ONE compiled combo
            # body instead of nppb*nppk unrolled copies -- up to 81 at
            # nprim=3, which explodes compile time; same tradeoff as the
            # slice loop in ops/eri.py)
            npp_b, npp_k = np1 * np2, np3 * np4
            kb_arr = jnp.asarray(
                np.repeat(np.arange(npp_b), npp_k), jnp.int32
            )
            kk_arr = jnp.asarray(np.tile(np.arange(npp_k), npp_b), jnp.int32)
            pa1_d = jnp.asarray(pa1, jnp.int32)
            pb1_d = jnp.asarray(pb1, jnp.int32)
            pa2_d = jnp.asarray(pa2, jnp.int32)
            pb2_d = jnp.asarray(pb2, jnp.int32)

            def _colt(x, i):
                # dynamic column gather (ar-native)
                if isinstance(x, df.DF64):
                    return df.DF64(
                        jnp.take(x.hi, i, axis=1), jnp.take(x.lo, i, axis=1)
                    )
                return jnp.take(x, i, axis=1)

            def combo(G, ci):
                kb, kk = kb_arr[ci], kk_arr[ci]
                a = _colt(ea, pa1_d[kb])
                b = _colt(eb, pb1_d[kb])
                cab = ar.mul(_colt(ca, pa1_d[kb]), _colt(cb, pb1_d[kb]))
                pdb = make_pair_data(ar, A, Bc, a, b, cab)
                inv2p = ar.scale_pow2(ar.recip(pdb["p"]), 0.5)
                Eb = stack_e_pairs(
                    ar, l1, l2,
                    e_tensor(ar, l1, l2, inv2p, pdb["xpa"], pdb["xpb"],
                             pdb["epref"]),
                )  # (B, nf12, NTb)
                c_ = _colt(ec, pa2_d[kk])
                d_ = _colt(ed, pb2_d[kk])
                ccd = ar.mul(_colt(cc, pa2_d[kk]), _colt(cd, pb2_d[kk]))
                pdk = make_pair_data(ar, C, D, c_, d_, ccd)
                inv2q = ar.scale_pow2(ar.recip(pdk["p"]), 0.5)
                Ek = stack_e_pairs(
                    ar, l3, l4,
                    e_tensor(ar, l3, l4, inv2q, pdk["xpa"], pdk["xpb"],
                             pdk["epref"]),
                )  # (B, nf34, NTk)
                psum = ar.add(pdb["p"], pdk["p"])
                theta = ar.div(ar.mul(pdb["p"], pdk["p"]), psum)
                PQ = ar.sub(pdb["P"], pdk["P"])
                r2 = _sumsq(ar, PQ)
                boys = ar.boys(L, ar.mul(theta, r2))
                RS = r_tensor_stacked(ar, L, theta, PQ, boys)  # (B, NR)
                M = ar.take(RS, idxM.reshape(-1), axis=-1)
                M = _rs(M, (B, NTb, NTk))
                pref = ar.mul(
                    ar.const(pref_c, ar.hi(psum).shape),
                    ar.recip(
                        ar.mul(ar.mul(pdb["p"], pdk["p"]), ar.sqrt(psum))
                    ),
                )
                pref = ar.mul(pref, ar.mul(pdb["coef"], pdk["coef"]))
                M = ar.mul(M, pref[..., None, None])
                M = ar.mul_f32(M, sgn_k[None, None, :])
                return ar.add(G, ar.bmm(ar.bmm(Eb, M), _t12(Ek))), None

            G, _ = jax.lax.scan(
                combo, ar.zeros((B, nf12, nf34)),
                jnp.arange(npp_b * npp_k, dtype=jnp.int32),
            )
            G = ar.mul_f32(G, w[:, None, None])
            _, kstreams = _contract_blocks(
                tier, G, aos, nfs, dm, nao, False, True
            )
            joined = _cat([_flat(v) for _, v, _ in kstreams])
            jix = jnp.concatenate([i.reshape(-1) for _, _, i in kstreams])
            limbs, sexp = scatter_limbs(joined, jix, nao * nao)
            return df.add(vk, limbs_to_df64(limbs, sexp)), None

        vk, _ = jax.lax.scan(chunk, vk, tasks)
        return vk

    return jax.jit(fn, donate_argnums=(6,))


# --------------------------------------------------------------- driver
class PairJEngine:
    """Pair-algorithm Coulomb-only builder (reference: pyscf/jk_pair.py).

    Reuses a JKEngine's class tables, Schwarz data, and tier cutoffs;
    produces vj identical (within tier accuracy) to the quartet engine
    at roughly NT_ab x NT_cd work per primitive-pair task instead of the
    full cartesian quartet contraction."""

    def __init__(self, layout: BasisLayout, cutoff_fp32=1e-13, cutoff_fp64=1e-6):
        from .jk_contracted import JKEngine

        self.jk = JKEngine(layout, cutoff_fp32, cutoff_fp64)
        self.layout = layout
        self.nao = layout.nao_int

    def get_j(self, dm_mol):
        eng = self.jk
        lay = self.layout
        nao = self.nao
        dm_int = lay.dm_to_internal(np.asarray(dm_mol, np.float64))
        logdm = float(np.log(max(np.abs(dm_int).max(), 1e-30)))
        log32 = np.log(eng.cutoff_fp32) - logdm
        log64 = np.log(eng.cutoff_fp64) - logdm
        dm_df = df.from_f64(dm_int)
        dm_f32 = jnp.asarray(dm_int, jnp.float32)
        pcs = eng.pair_classes

        # ---- stage A: Hermite densities + primitive-pair auxiliaries
        aux, jh = {}, {}
        meta = {}
        for pci, pc in enumerate(pcs):
            eng._ensure_q(pc)
            c1, c2 = eng.classes[pc.ci], eng.classes[pc.cj]
            wpair = np.where(pc.diag, 1.0, 2.0).astype(np.float32)
            NT = _nt(c1.l + c2.l)
            npp = c1.nprim * c2.nprim
            meta[pci] = (c1, c2, NT, npp)
            for tier in ("df64", "f32"):
                tb = eng._tables(tier)
                fnA = _stageA_fn(c1.l, c2.l, c1.nprim, c2.nprim, tier, nao)
                aux[(pci, tier)] = fnA(
                    tb[pc.ci], tb[pc.cj],
                    jnp.asarray(pc.i_loc), jnp.asarray(pc.j_loc),
                    jnp.asarray(wpair),
                    dm_df if tier == "df64" else dm_f32,
                )
                jh[(pci, tier)] = df.const(0.0, (pc.npair * npp * NT,))

        # ---- stage B: screened task scans, both directions at once
        for p1i in range(len(pcs)):
            p1 = pcs[p1i]
            c1b, c2b, NTb, nppb = meta[p1i]
            for p2i in range(p1i + 1):
                p2 = pcs[p2i]
                c1k, c2k, NTk, nppk = meta[p2i]
                same = p1i == p2i
                t1, t2, _, tier64 = build_quartet_tasks(
                    p1, p2, same, log32, log64
                )
                if len(t1) == 0:
                    continue
                w_all = np.where(same & (t1 == t2), 0.5, 1.0)
                lab = c1b.l + c2b.l
                lcd = c1k.l + c2k.l
                sizeb = p1.npair * nppb * NTb
                sizek = p2.npair * nppk * NTk
                for tier, sel in (("df64", tier64), ("f32", ~tier64)):
                    n = int(sel.sum())
                    if n == 0:
                        continue
                    B = _chunk_size((c1b.l, c2b.l, c1k.l, c2k.l), n)
                    s1, s2, sw = t1[sel], t2[sel], w_all[sel]
                    npad = (-n) % B
                    s1 = np.concatenate([s1, np.zeros(npad, np.int32)])
                    s2 = np.concatenate([s2, np.zeros(npad, np.int32)])
                    sw = np.concatenate([sw, np.zeros(npad)])
                    nchunk = len(s1) // B
                    tasks = (
                        jnp.asarray(s1.reshape(nchunk, B), jnp.int32),
                        jnp.asarray(s2.reshape(nchunk, B), jnp.int32),
                        jnp.asarray(sw.reshape(nchunk, B), jnp.float32),
                    )
                    fnB = _stageB_fn(lab, lcd, nppb, nppk, tier, sizeb, sizek)
                    if same:
                        jhb, jhk = fnB(
                            aux[(p1i, tier)], aux[(p2i, tier)], tasks,
                            jh[(p1i, tier)], df.const(0.0, (sizek,)),
                        )
                        jh[(p1i, tier)] = df.add(jhb, jhk)
                    else:
                        jh[(p1i, tier)], jh[(p2i, tier)] = fnB(
                            aux[(p1i, tier)], aux[(p2i, tier)], tasks,
                            jh[(p1i, tier)], jh[(p2i, tier)],
                        )

        # ---- stage C: apply bra E tensors, scatter AO blocks
        vj = df.const(0.0, (nao * nao,))
        for pci, pc in enumerate(pcs):
            c1, c2, NT, npp = meta[pci]
            wd = np.where(pc.diag, 0.5, 1.0).astype(np.float32)
            P = pc.npair
            B = min(1024, 1 << int(np.ceil(np.log2(max(P, 64)))))
            npad = (-P) % B
            pidx = np.concatenate([np.arange(P, dtype=np.int32),
                                   np.zeros(npad, np.int32)])
            il = np.concatenate([pc.i_loc, np.zeros(npad, np.int32)])
            jl = np.concatenate([pc.j_loc, np.zeros(npad, np.int32)])
            wdp = np.concatenate([wd, np.zeros(npad, np.float32)])
            nchunk = len(pidx) // B
            tasks = (
                jnp.asarray(pidx.reshape(nchunk, B)),
                jnp.asarray(il.reshape(nchunk, B)),
                jnp.asarray(jl.reshape(nchunk, B)),
                jnp.asarray(wdp.reshape(nchunk, B)),
            )
            for tier in ("df64", "f32"):
                tb = eng._tables(tier)
                fnC = _stageC_fn(c1.l, c2.l, c1.nprim, c2.nprim, tier, nao)
                vj = fnC(tb[pc.ci], tb[pc.cj], tasks, jh[(pci, tier)], vj)

        vj64 = df.to_f64(vj).reshape(nao, nao)
        return lay.mat_to_mol(vj64 + vj64.T)

    def get_k(self, dm_mol):
        """Pair-algorithm exchange matrix (reference: pair_vk.cu).

        Same screening, tier partition, and symmetry-weight conventions
        as the quartet engine; the ERI evaluation is the Hermite
        E @ M @ E^T factorization of :func:`_vk_fn`."""
        eng = self.jk
        lay = self.layout
        nao = self.nao
        dm_int = lay.dm_to_internal(np.asarray(dm_mol, np.float64))
        logdm = float(np.log(max(np.abs(dm_int).max(), 1e-30)))
        log32 = np.log(eng.cutoff_fp32) - logdm
        log64 = np.log(eng.cutoff_fp64) - logdm
        dm_df = df.from_f64(dm_int)
        dm_f32 = jnp.asarray(dm_int, jnp.float32)
        pcs = eng.pair_classes
        for pc in pcs:
            eng._ensure_q(pc)

        vk = {"df64": df.const(0.0, (nao * nao,)),
              "f32": df.const(0.0, (nao * nao,))}
        for p1i in range(len(pcs)):
            p1 = pcs[p1i]
            c1, c2 = eng.classes[p1.ci], eng.classes[p1.cj]
            for p2i in range(p1i + 1):
                p2 = pcs[p2i]
                c3, c4 = eng.classes[p2.ci], eng.classes[p2.cj]
                same = p1i == p2i
                t1, t2, w_all, tier64 = build_quartet_tasks(
                    p1, p2, same, log32, log64
                )
                if len(t1) == 0:
                    continue
                ls = (c1.l, c2.l, c3.l, c4.l)
                for tier, sel in (("df64", tier64), ("f32", ~tier64)):
                    n = int(sel.sum())
                    if n == 0:
                        continue
                    B = _chunk_size(ls, n)
                    s1, s2, sw = t1[sel], t2[sel], w_all[sel]
                    npad = (-n) % B
                    il1 = np.concatenate(
                        [p1.i_loc[s1], np.zeros(npad, np.int32)])
                    jl1 = np.concatenate(
                        [p1.j_loc[s1], np.zeros(npad, np.int32)])
                    il2 = np.concatenate(
                        [p2.i_loc[s2], np.zeros(npad, np.int32)])
                    jl2 = np.concatenate(
                        [p2.j_loc[s2], np.zeros(npad, np.int32)])
                    sw = np.concatenate([sw, np.zeros(npad)])
                    nchunk = len(il1) // B
                    tasks = tuple(
                        jnp.asarray(x.reshape(nchunk, B), dt)
                        for x, dt in (
                            (il1, jnp.int32), (jl1, jnp.int32),
                            (il2, jnp.int32), (jl2, jnp.int32),
                            (sw, jnp.float32),
                        )
                    )
                    tb = eng._tables(tier)
                    fnK = _vk_fn(
                        c1.l, c2.l, c3.l, c4.l,
                        c1.nprim, c2.nprim, c3.nprim, c4.nprim, tier, nao,
                    )
                    vk[tier] = fnK(
                        tb[p1.ci], tb[p1.cj], tb[p2.ci], tb[p2.cj],
                        tasks, dm_df if tier == "df64" else dm_f32, vk[tier],
                    )

        vk64 = (df.to_f64(vk["df64"]) + df.to_f64(vk["f32"])).reshape(nao, nao)
        return lay.mat_to_mol(vk64 + vk64.T)

    def get_jk(self, dm_mol):
        """(vj, vk) through the pair algorithm (reference:
        jqc/pyscf/jk_pair.py:85 generate_jk_kernel)."""
        return self.get_j(dm_mol), self.get_k(dm_mol)


# Reference naming: the pair engine provides both vj and vk
# (jqc/backend/jk_pair.py gen_vj_kernel/gen_vk_kernel).
PairJKEngine = PairJEngine

__all__ = ["PairJEngine", "PairJKEngine"]
