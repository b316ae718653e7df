"""Class-specialized contracted ERI batches (the TPU ERI engine core).

The unit of work is a *task* = one shell quartet of a fixed class
(la,lb,lc,ld, npa..npd); a batch of T tasks is processed with all
recurrences vectorized over T (see ops/md.py).

The contraction over primitive quartets is FLATTENED INTO THE VECTOR
BATCH in slices: the primitive pipeline runs on a batch of
(n_slice * T) virtual tasks per step, scanned over ceil(npq/n_slice)
slices.  Round-2 profiling on v5e showed a ``lax.scan`` with one
primitive quartet per step pays a large fixed cost PER LOOP ITERATION
(~0.1-1 ms) that dwarfed the arithmetic -- on TPU the slice width is
chosen so the WHOLE contraction is usually a single step (no loop at
all), bounded only by a transient-memory budget.  On CPU (the unit-test
platform) wide slices explode XLA compile time, so the slice width
stays small there.  Reference counterpart: the unrolled per-thread
primitive loops of /root/reference/jqc/backend/jk/1q1t.cu:173-408.
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

from .arith import get_arith
from .harmonics import cart_components
from .md import cart_eri_primitive_s as cart_eri_primitive
from .md import make_pair_data_s as make_pair_data

# Pallas TPU kernel for the class ERI batch (ops/eri_pallas.py); the
# XLA path remains for CPU, high-l classes, and as a fallback
_USE_PALLAS = os.environ.get("JQC_ERI_PALLAS", "1") != "0"

# element budget for the flattened primitive batch on accelerators
# (tasks x slice width x output block size)
_FLAT_ELEMS = int(os.environ.get("JQC_ERI_FLAT_ELEMS", str(1 << 23)))
# slice width on CPU (graph size = slice width x quartet body; CPU XLA
# compile time is the binding constraint there)
_CPU_SLICE = int(os.environ.get("JQC_ERI_CPU_SLICE", "4"))


def _is_df(x):
    from . import df64 as _df

    return isinstance(x, _df.DF64)


def _gather_slots(x, idx):
    """(T, np) ar-native, slot list idx (n,) -> (n, T)."""
    from . import df64 as _df

    if _is_df(x):
        return _df.DF64(_gather_slots(x.hi, idx), _gather_slots(x.lo, idx))
    return x[:, idx].T


def _reshape(x, shape):
    from . import df64 as _df

    if _is_df(x):
        return _df.DF64(x.hi.reshape(shape), x.lo.reshape(shape))
    return x.reshape(shape)


def _bcast_coords(x, n):
    """(T, 3) -> (n*T, 3)."""
    from . import df64 as _df

    if _is_df(x):
        return _df.DF64(_bcast_coords(x.hi, n), _bcast_coords(x.lo, n))
    return jnp.broadcast_to(x[None], (n,) + x.shape).reshape(-1, x.shape[-1])


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
    T = ar.hi(quartet["exps_a"]).shape[0]

    if _USE_PALLAS and jax.default_backend() == "tpu":
        from .eri_pallas import eri_chunk_pallas, pallas_supported

        if pallas_supported(tier, ls, nprims, T):
            return eri_chunk_pallas(tier, ls, nprims, quartet, omega)

    # flattened primitive-quartet slot lists (bra-major)
    ia, ib, ic, id_ = [], [], [], []
    for i in range(npa):
        for j in range(npb):
            for k in range(npc):
                for l in range(npd):
                    ia.append(i)
                    ib.append(j)
                    ic.append(k)
                    id_.append(l)
    npq = len(ia)

    nfel = (
        len(cart_components(la)) * len(cart_components(lb))
        * len(cart_components(lc)) * len(cart_components(ld))
    )
    if jax.default_backend() == "cpu":
        n_slice = min(npq, _CPU_SLICE)
    else:
        n_slice = max(1, _FLAT_ELEMS // max(T * max(nfel, 8), 1))
        n_slice = min(n_slice, npq)
    nsl = -(-npq // n_slice)
    npad = nsl * n_slice - npq
    # pad with repeats of slot 0; their contribution is zeroed via scale
    scale = np.ones(npq + npad, np.float32)
    if npad:
        ia += [ia[0]] * npad
        ib += [ib[0]] * npad
        ic += [ic[0]] * npad
        id_ += [id_[0]] * npad
        scale[npq:] = 0.0

    def cols(name, idx):
        return _gather_slots(quartet[name], np.asarray(idx, np.int64))

    # (npq_pad, T) slot-gathered primitive data
    ea, ca = cols("exps_a", ia), cols("coefs_a", ia)
    eb, cb = cols("exps_b", ib), cols("coefs_b", ib)
    ec, cc = cols("exps_c", ic), cols("coefs_c", ic)
    ed, cd = cols("exps_d", id_), cols("coefs_d", id_)
    cab = ar.mul(ca, cb)
    # fold the pad-slot zero scale into the bra coefficient product
    if npad:
        cab = ar.mul_f32(cab, jnp.asarray(scale)[:, None])
    ccd = ar.mul(cc, cd)

    A, B, C, D = (
        quartet["coord_a"], quartet["coord_b"],
        quartet["coord_c"], quartet["coord_d"],
    )

    def slice_block(xs):
        ea_s, eb_s, ec_s, ed_s, cab_s, ccd_s = (
            _reshape(x, (n_slice * T,)) for x in xs
        )
        Ax, Bx, Cx, Dx = (_bcast_coords(x, n_slice) for x in (A, B, C, D))
        pdata = make_pair_data(ar, Ax, Bx, ea_s, eb_s, cab_s)
        qdata = make_pair_data(ar, Cx, Dx, ec_s, ed_s, ccd_s)
        blk = cart_eri_primitive(ar, ls, pdata, qdata, omega)
        # (n_slice*T, nfab, nfcd) -> unrolled sum over the slice slots
        from . import df64 as _df

        if _is_df(blk):
            parts = [
                _df.DF64(
                    blk.hi[s * T : (s + 1) * T], blk.lo[s * T : (s + 1) * T]
                )
                for s in range(n_slice)
            ]
            acc = parts[0]
            for pp in parts[1:]:
                acc = _df.add(acc, pp)
            return acc
        return jnp.sum(blk.reshape((n_slice, T) + blk.shape[1:]), axis=0)

    def to_slices(x):
        return _reshape(x, (nsl, n_slice, T))

    xs = tuple(to_slices(x) for x in (ea, eb, ec, ed, cab, ccd))
    if nsl == 1:
        return slice_block(tuple(_reshape(x, (n_slice, T)) for x in
                                 (ea, eb, ec, ed, cab, ccd)))

    def body(acc, x):
        blk = slice_block(x)
        from . import df64 as _df

        return (_df.add(acc, blk) if _is_df(blk) else acc + blk), None

    init = ar.zeros(
        (T, len(cart_components(la)) * len(cart_components(lb)),
         len(cart_components(lc)) * len(cart_components(ld)))
    )
    out, _ = jax.lax.scan(body, init, xs)
    return out


__all__ = ["contracted_eri_batch"]
