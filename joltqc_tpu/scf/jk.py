"""J/K Fock-build engine: class-specialized batched TPU kernels.

Reference counterpart: /root/reference/jqc/pyscf/jk.py (driver) +
jqc/backend/jk*.py (NVRTC kernels).  TPU-native redesign:

 - tasks are *primitive-pair quartets* (bra prim-pair x ket prim-pair),
   so the kernel class key is only the angular quartet (la,lb,lc,ld) --
   contraction depth and basis padding never trigger recompiles
   (compare the reference's 140-entry per-device scheme tables,
   jqc/backend/data/).
 - 8-fold symmetry is handled by weighted unique tasks + one final
   transpose-add, not divergent per-thread branches
   (1q1t.cu:86-94).
 - accumulation is the deterministic int32 fixed-point scatter of
   ops/accum.py -- no atomics, bit-reproducible.
 - FP32/DF64 mixed precision routes each task by the Schwarz+density
   bound, mirroring the two-sided queue of screen_jk_tasks.cu but as a
   host-side stable partition.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from ..mol.layout import BasisLayout
from ..ops import df64 as df
from ..ops.accum import scatter_add_det
from ..ops.arith import get_arith
from ..ops.eri import contracted_eri_batch  # noqa: F401 (contracted path, future)
from ..ops.harmonics import cart_components
from ..ops.md import cart_eri_primitive, make_pair_data


def _nf(l):
    return len(cart_components(l))


def _maybe_jit(f, **kw):
    """jit on accelerators; eager on CPU.

    The XLA:CPU executor in this jax build non-deterministically never
    finishes executing large fused DF64 modules (shape-dependent; e.g.
    the (1,0,1,1) class), so on CPU the heavy stages run op-by-op.  Set
    JQC_CPU_JIT=1 to force jit on CPU anyway.
    """
    import os

    if jax.default_backend() == "cpu" and os.environ.get("JQC_CPU_JIT") != "1":
        return f
    return jax.jit(f, **kw)


@lru_cache(maxsize=None)
def _jk_contrib_fn(ls, tier, nao, with_j, with_k):
    """Stage 1 (jitted per class): tasks + dm -> flattened contributions.

    Deliberately split from the scatter/accumulate stage: one monolithic
    XLA module (eri + contraction + fixed-point scatter) compiled but its
    execution never completed on the CPU backend (executor pathology with
    ~38k-op modules); two lean modules also compile much faster and the
    scatter stage is reusable across classes.
    """
    ar = get_arith(tier)
    la, lb, lc, ld = ls
    nfa, nfb, nfc, nfd = _nf(la), _nf(lb), _nf(lc), _nf(ld)

    def fn(geom, dm):
        pd = make_pair_data(
            ar, geom["A"], geom["B"], geom["ea"], geom["eb"], geom["cab"]
        )
        qd = make_pair_data(
            ar, geom["C"], geom["D"], geom["ec"], geom["ed"], geom["ccd"]
        )
        G = cart_eri_primitive(ar, ls, pd, qd)  # (T, nfa*nfb, nfc*nfd)

        ao_a, ao_b, ao_c, ao_d = (
            geom["ao_a"], geom["ao_b"], geom["ao_c"], geom["ao_d"]
        )
        T = ao_a.shape[0]

        def blk_idx(ao_x, nx, ao_y, ny):
            return (
                (ao_x[:, None, None] + jnp.arange(nx)[None, :, None]) * nao
                + ao_y[:, None, None]
                + jnp.arange(ny)[None, None, :]
            ).reshape(T, nx * ny)

        def dm_blk(idx):
            if tier in ("df64", "fp64"):
                return df.DF64(
                    jnp.take(dm.hi.reshape(-1), idx),
                    jnp.take(dm.lo.reshape(-1), idx),
                )
            return jnp.take(dm.reshape(-1), idx)

        idx_ab = blk_idx(ao_a, nfa, ao_b, nfb)
        idx_cd = blk_idx(ao_c, nfc, ao_d, nfd)

        def bmv(mat, vec):
            # (T, m, k) x (T, k) -> (T, m)
            out = ar.bmm(mat, vec[..., None] if not hasattr(vec, "hi")
                         else df.DF64(vec.hi[..., None], vec.lo[..., None]))
            return out[:, :, 0] if not hasattr(out, "hi") else df.DF64(
                out.hi[:, :, 0], out.lo[:, :, 0]
            )

        def flat1(x):
            if hasattr(x, "hi"):
                return df.DF64(x.hi.reshape(-1), x.lo.reshape(-1))
            return x.reshape(-1)

        # NOTE: contributions are returned as SEPARATE outputs -- joining
        # them (concatenate/stack/pad) inside this module makes the
        # XLA:CPU executor spin forever (observed on jax 0.9 CPU: any
        # layout-joining op over two deep fused subgraphs); the join
        # happens in the scatter stage where operands are plain inputs.
        jvals: tuple = ()
        jidx: tuple = ()
        kvals: tuple = ()
        kidx: tuple = ()
        if with_j:
            d_cd = dm_blk(idx_cd)
            d_ab = dm_blk(idx_ab)
            jvals = (
                flat1(ar.mul_f32(bmv(G, d_cd), 2.0)),
                flat1(ar.mul_f32(bmv(_t12(G), d_ab), 2.0)),
            )
            jidx = (idx_ab.reshape(-1), idx_cd.reshape(-1))
        if with_k:
            G4 = _reshape(G, (T, nfa, nfb, nfc, nfd))
            idx_ac = blk_idx(ao_a, nfa, ao_c, nfc)
            idx_ad = blk_idx(ao_a, nfa, ao_d, nfd)
            idx_bc = blk_idx(ao_b, nfb, ao_c, nfc)
            idx_bd = blk_idx(ao_b, nfb, ao_d, nfd)
            kvals = (
                flat1(bmv(_perm(G4, (0, 1, 3, 2, 4), nfa * nfc, nfb * nfd), dm_blk(idx_bd))),
                flat1(bmv(_perm(G4, (0, 1, 4, 2, 3), nfa * nfd, nfb * nfc), dm_blk(idx_bc))),
                flat1(bmv(_perm(G4, (0, 2, 3, 1, 4), nfb * nfc, nfa * nfd), dm_blk(idx_ad))),
                flat1(bmv(_perm(G4, (0, 2, 4, 1, 3), nfb * nfd, nfa * nfc), dm_blk(idx_ac))),
            )
            kidx = (
                idx_ac.reshape(-1), idx_ad.reshape(-1),
                idx_bc.reshape(-1), idx_bd.reshape(-1),
            )
        return jvals, jidx, kvals, kidx

    return _maybe_jit(fn)


@lru_cache(maxsize=None)
def _scatter_acc_fn(nao):
    """Stage 2 (jitted, shared across classes): join + scatter into acc.

    The concatenate here is over jit INPUTS (materialized buffers), which
    sidesteps the CPU-executor hang triggered by concatenating deep fused
    subgraphs (see _jk_contrib_fn)."""

    def fn(vals, idx, acc):
        joined = _cat(list(vals)) if len(vals) > 1 else vals[0]
        jidx = jnp.concatenate(list(idx)) if len(idx) > 1 else idx[0]
        return df.add(acc, scatter_add_det(joined, jidx, nao * nao))

    return jax.jit(fn, donate_argnums=(2,))


def _t12(x):
    if hasattr(x, "hi"):
        return df.DF64(x.hi.transpose(0, 2, 1), x.lo.transpose(0, 2, 1))
    return x.transpose(0, 2, 1)


def _reshape(x, shape):
    if hasattr(x, "hi"):
        return df.DF64(x.hi.reshape(shape), x.lo.reshape(shape))
    return x.reshape(shape)


def _perm(x, axes, m, n):
    T = x.hi.shape[0] if hasattr(x, "hi") else x.shape[0]
    if hasattr(x, "hi"):
        return df.DF64(
            x.hi.transpose(axes).reshape(T, m, n), x.lo.transpose(axes).reshape(T, m, n)
        )
    return x.transpose(axes).reshape(T, m, n)


def _cat(parts):
    if hasattr(parts[0], "hi"):
        return df.DF64(
            jnp.concatenate([p.hi for p in parts]),
            jnp.concatenate([p.lo for p in parts]),
        )
    return jnp.concatenate(parts)


@lru_cache(maxsize=None)
def _q_diag_fn(lij):
    """f32 kernel for the Schwarz diagonal: max_components |(ab|ab)|^... -> q^2."""
    li, lj = lij
    ar = get_arith("f32")
    ls = (li, lj, li, lj)

    def fn(geom):
        pd = make_pair_data(ar, geom["A"], geom["B"], geom["ea"], geom["eb"], geom["cab"])
        qd = make_pair_data(ar, geom["C"], geom["D"], geom["ec"], geom["ed"], geom["ccd"])
        G = cart_eri_primitive(ar, ls, pd, qd)  # (T, nfab, nfab)
        diag = jnp.abs(jnp.diagonal(G, axis1=1, axis2=2))
        return jnp.max(diag, axis=1)  # q^2 per task

    return _maybe_jit(fn)


def _bucket(n, minimum=256):
    b = minimum
    while b < n:
        b *= 2
    return b


def build_geom_batch(P1, P2, t1, t2, w, tier, batch):
    """Assemble the padded per-task geometry dict consumed by
    _jk_contrib_fn from two PrimPairBlocks and task index lists.

    Pad tasks carry zero coefficients (``cab``/``ccd`` = 0) so they
    contribute exactly nothing; exponents pad to 1 to keep the kernels
    finite.  ``w`` folds the 8-fold-symmetry weights into ``ccd``.
    """
    n = len(t1)
    pad = batch - n

    geom_np = {
        "A": P1.A[t1], "B": P1.B[t1], "C": P2.A[t2], "D": P2.B[t2],
        "ea": P1.ea[t1], "eb": P1.eb[t1], "ec": P2.ea[t2], "ed": P2.eb[t2],
        "cab": P1.cab[t1], "ccd": P2.cab[t2] * w,
    }
    ao_np = {
        "ao_a": P1.ao_i[t1], "ao_b": P1.ao_j[t1],
        "ao_c": P2.ao_i[t2], "ao_d": P2.ao_j[t2],
    }
    if pad:
        for k in ("A", "B", "C", "D"):
            geom_np[k] = np.concatenate([geom_np[k], np.zeros((pad, 3))])
        for k in ("ea", "eb", "ec", "ed"):
            geom_np[k] = np.concatenate([geom_np[k], np.ones(pad)])
        for k in ("cab", "ccd"):
            geom_np[k] = np.concatenate([geom_np[k], np.zeros(pad)])
        for k in ao_np:
            ao_np[k] = np.concatenate([ao_np[k], np.zeros(pad, np.int32)])

    geom = {}
    for k, v in geom_np.items():
        geom[k] = df.from_f64(v) if tier == "df64" else jnp.asarray(v, jnp.float32)
    for k, v in ao_np.items():
        geom[k] = jnp.asarray(v, jnp.int32)
    return geom


class JKEngine:
    """get_jk over a BasisLayout with mixed-precision task routing."""

    def __init__(
        self,
        layout: BasisLayout,
        cutoff_fp32: float = 1e-13,
        cutoff_fp64: float = 1e-6,
        max_batch: int = 16384,
    ):
        self.layout = layout
        self.cutoff_fp32 = cutoff_fp32
        self.cutoff_fp64 = cutoff_fp64
        self.max_batch = max_batch
        self.nao = layout.nao_int
        self._task_cache: dict = {}
        # XLA:CPU's executor deadlocks when several of these large modules
        # are in flight concurrently (async dispatch); serialize on CPU.
        self._sync = jax.default_backend() == "cpu"

    # ------------------------------------------------------------ tasks
    def _block_pairs(self):
        blocks = [self.layout.pair_block(li, lj) for (li, lj) in self.layout.lpairs()]
        out = []
        for i in range(len(blocks)):
            for j in range(i, len(blocks)):
                out.append((blocks[i], blocks[j]))
        return out

    def _tasks_for(self, P1, P2, log_cut32, log_cut64, dm_cond_sh=None):
        """Unique weighted tasks for a bra-block x ket-block combination.

        Returns (idx1, idx2, weight, tier_mask64) as numpy arrays.
        """
        same = P1 is P2
        self._ensure_q(P1)
        self._ensure_q(P2)
        est = P1.q_log[:, None] + P2.q_log[None, :]
        if dm_cond_sh is not None:
            # max |dm| over the 6 blocks entering the contraction
            dmx = np.log(
                np.maximum(
                    np.maximum(
                        np.maximum(
                            dm_cond_sh[P1.ish[:, None], P2.ish[None, :]],
                            dm_cond_sh[P1.ish[:, None], P2.jsh[None, :]],
                        ),
                        np.maximum(
                            dm_cond_sh[P1.jsh[:, None], P2.ish[None, :]],
                            dm_cond_sh[P1.jsh[:, None], P2.jsh[None, :]],
                        ),
                    ),
                    np.maximum(
                        dm_cond_sh[P1.ish[:, None], P1.jsh[:, None]],
                        dm_cond_sh[P2.ish[None, :], P2.jsh[None, :]],
                    ),
                )
                + 1e-300
            )
            est = est + dmx
        keep = est > log_cut32
        if same:
            keep &= P1.pair_id[:, None] >= P2.pair_id[None, :]
        i1, i2 = np.nonzero(keep)
        w = np.where(P1.diag[i1], 0.5, 1.0) * np.where(P2.diag[i2], 0.5, 1.0)
        if same:
            w = w * np.where(P1.pair_id[i1] == P2.pair_id[i2], 0.5, 1.0)
        tier64 = est[i1, i2] > log_cut64
        return i1, i2, w, tier64

    # ------------------------------------------------------------ main
    def get_jk(self, dm_mol, with_j=True, with_k=True):
        lay = self.layout
        nao = self.nao
        dm_int = lay.dm_to_internal(np.asarray(dm_mol, np.float64))
        dm_cond = lay.dm_cond(dm_int)
        dm_df = df.from_f64(dm_int)
        dm_f32 = jnp.asarray(dm_int, jnp.float32)

        vj = df.const(0.0, (nao * nao,))
        vk = df.const(0.0, (nao * nao,))

        log_cut32 = np.log(self.cutoff_fp32)
        log_cut64 = np.log(self.cutoff_fp64)

        for P1, P2 in self._block_pairs():
            i1, i2, w, tier64 = self._tasks_for(P1, P2, log_cut32, log_cut64, dm_cond)
            if len(i1) == 0:
                continue
            for tier, sel in (("df64", tier64), ("f32", ~tier64)):
                t1, t2, tw = i1[sel], i2[sel], w[sel]
                if len(t1) == 0:
                    continue
                for s in range(0, len(t1), self.max_batch):
                    vj, vk = self._run_batch(
                        P1, P2, t1[s:s + self.max_batch], t2[s:s + self.max_batch],
                        tw[s:s + self.max_batch], tier,
                        dm_df if tier == "df64" else dm_f32,
                        vj, vk, with_j, with_k,
                    )

        vj64 = df.to_f64(vj).reshape(nao, nao) if with_j else None
        vk64 = df.to_f64(vk).reshape(nao, nao) if with_k else None
        out_j = out_k = None
        if with_j:
            vj64 = vj64 + vj64.T
            out_j = lay.mat_to_mol(vj64)
        if with_k:
            vk64 = vk64 + vk64.T
            out_k = lay.mat_to_mol(vk64)
        return out_j, out_k

    def _ensure_q(self, P):
        """Schwarz bound per primitive pair: q = sqrt(max |(ab|ab)|).

        Computed with the f32 ERI kernel on pair-diagonal tasks -- the TPU
        analogue of the reference's CPU `CVHFnr_int2e_q_cond` call
        (/root/reference/jqc/pyscf/basis.py:840-867), but running on the
        same engine it screens for."""
        if P.q_log is not None:
            return
        n = P.n
        B = _bucket(n)
        pad = B - n
        z3 = np.zeros((pad, 3))
        geom = {
            "A": np.concatenate([P.A, z3]), "B": np.concatenate([P.B, z3]),
            "C": np.concatenate([P.A, z3]), "D": np.concatenate([P.B, z3]),
            "ea": np.concatenate([P.ea, np.ones(pad)]),
            "eb": np.concatenate([P.eb, np.ones(pad)]),
            "ec": np.concatenate([P.ea, np.ones(pad)]),
            "ed": np.concatenate([P.eb, np.ones(pad)]),
            "cab": np.concatenate([P.cab, np.zeros(pad)]),
            "ccd": np.concatenate([P.cab, np.zeros(pad)]),
        }
        geom = {k: jnp.asarray(v, jnp.float32) for k, v in geom.items()}
        fn = _q_diag_fn((P.li, P.lj))
        q = np.asarray(fn(geom))[:n]
        P.q_log = np.log(np.maximum(q, 1e-38)).astype(np.float32) * 0.5

    def _run_batch(self, P1, P2, t1, t2, w, tier, dm_dev, vj, vk, with_j, with_k):
        geom = build_geom_batch(P1, P2, t1, t2, w, tier, _bucket(len(t1)))
        ls = (P1.li, P1.lj, P2.li, P2.lj)
        fn = _jk_contrib_fn(ls, tier, self.nao, with_j, with_k)
        jvals, jidx, kvals, kidx = fn(geom, dm_dev)
        if self._sync:
            jax.block_until_ready(jax.tree.leaves((jvals, kvals)))
        scat = _scatter_acc_fn(self.nao)
        if with_j:
            vj = scat(tuple(jvals), tuple(jidx), vj)
        if with_k:
            vk = scat(tuple(kvals), tuple(kidx), vk)
        if self._sync:
            jax.block_until_ready(jax.tree.leaves((vj, vk)))
        return vj, vk


__all__ = ["JKEngine"]
