"""Class-specialized contracted ERI batches (the TPU ERI engine core).

The unit of work is a *task* = one shell quartet of a fixed class
(la,lb,lc,ld, npa..npd); a batch of T tasks is processed with all
recurrences vectorized over T (see ops/md.py).  The contraction over
primitive quartets runs as a lax.scan so the traced graph is the size of
ONE primitive quartet regardless of contraction depth -- the TPU
counterpart of the reference's unrolled per-thread primitive loops
(/root/reference/jqc/backend/jk/1q1t.cu:173-408).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .arith import get_arith
from .md import cart_eri_primitive, make_pair_data


def _tree_stack(trees):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


def _tree_take(tree, idx):
    return jax.tree.map(lambda x: x[idx], tree)


def contracted_eri_batch(tier: str, ls, nprims, quartet, omega: float = 0.0):
    """Cartesian ERI blocks (T, nfab, nfcd) for a batch of shell quartets.

    quartet: dict with, per center X in a,b,c,d:
      coord_X: (T, 3) ar-native (f32 array for the f32 tier; DF64 of the
               same shape for the df64 tier)
      exps_X:  (T, npX)
      coefs_X: (T, npX)
    omega > 0: long-range erf(omega*r12)/r12 kernel (see ops/md.py).
    """
    ar = get_arith(tier)
    la, lb, lc, ld = ls
    npa, npb, npc, npd = nprims

    A = quartet["coord_a"]
    B = quartet["coord_b"]
    C = quartet["coord_c"]
    D = quartet["coord_d"]

    def prims(name, n):
        e, c = quartet[f"exps_{name}"], quartet[f"coefs_{name}"]
        return [(e[:, i], c[:, i]) for i in range(n)]

    pa, pb, pc, pd = prims("a", npa), prims("b", npb), prims("c", npc), prims("d", npd)

    bra_pairs = [
        make_pair_data(ar, A, B, ea, eb, ar.mul(ca, cb))
        for (ea, ca) in pa
        for (eb, cb) in pb
    ]
    ket_pairs = [
        make_pair_data(ar, C, D, ec, ed, ar.mul(cc, cd))
        for (ec, cc) in pc
        for (ed, cd) in pd
    ]

    npab, npcd = len(bra_pairs), len(ket_pairs)
    if npab * npcd == 1:
        return cart_eri_primitive(ar, ls, bra_pairs[0], ket_pairs[0], omega)

    bra_stack = _tree_stack(bra_pairs)
    ket_stack = _tree_stack(ket_pairs)
    idx_ab = np.repeat(np.arange(npab), npcd)
    idx_cd = np.tile(np.arange(npcd), npab)
    xs = (_tree_take(bra_stack, idx_ab), _tree_take(ket_stack, idx_cd))

    def body(acc, x):
        pdata, qdata = x
        blk = cart_eri_primitive(ar, ls, pdata, qdata, omega)
        from . import df64 as _df

        if tier in ("df64", "fp64"):
            return _df.add(acc, blk), None
        return acc + blk, None

    T = quartet["exps_a"].hi.shape[0] if tier in ("df64", "fp64") else quartet["exps_a"].shape[0]
    from .harmonics import cart_components

    nfab = len(cart_components(la)) * len(cart_components(lb))
    nfcd = len(cart_components(lc)) * len(cart_components(ld))
    init = ar.zeros((T, nfab, nfcd))
    out, _ = jax.lax.scan(body, init, xs)
    return out


__all__ = ["contracted_eri_batch"]
