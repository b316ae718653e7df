"""Deterministic high-precision scatter accumulation for TPU.

The reference accumulates vj/vk/Fock contributions with CUDA
``atomicAdd`` on FP64 (/root/reference/jqc/backend/jk/1q1t.cu:423-643,
eval_vxc.cu:357-420).  TPUs have neither atomics nor native f64, and
float scatter-adds are non-associative (order-dependent rounding).  This
module provides the TPU-native answer: contributions are decomposed into
int32 fixed-point limbs and scatter-added with INTEGER arithmetic, which
is exactly associative -- so the accumulation is bit-deterministic
regardless of execution order, and exact to 64 bits below the batch's
max magnitude (beyond DF64 precision).

Contract: at most ~5e5 contributions may target one output element per
call (int32 headroom: limbs carry <=13 bits, 2^31/2^12 adds).  Callers
accumulate across calls in DF64 (df64.add is elementwise, no scatter).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import df64 as df
from .df64 import DF64, _pow2_exact

_LIMB_BITS = 13


def _exp_of_max(x_abs_max):
    """floor(log2(max)) via frexp, guarded for zero."""
    m = jnp.maximum(x_abs_max, jnp.float32(1e-30))
    _, e = jnp.frexp(m)
    return e.astype(jnp.int32)  # m = frac * 2^e, frac in [0.5, 1)


def scatter_limbs(values, idx, size: int, nlimb: int = 5, x_abs_max=None):
    """Stage 1: scatter contributions into int32 fixed-point limb arrays.

    Returns ``(limbs, sexp)``: ``limbs`` is an (nlimb, size) int32 array,
    ``sexp`` the power-of-two scaling exponent.  Because limbs are plain
    integers, partial results from different devices can be combined with
    an exact ``jax.lax.psum`` before ``limbs_to_df64`` -- this is the
    multi-chip reduction path (see joltqc_tpu/parallel/jk_sharded.py).

    ``x_abs_max`` overrides the magnitude used to pick the scale; pass a
    ``pmax`` across devices so every shard uses the same scale.
    """
    if not isinstance(values, DF64):
        values = df.from_f32(values)
        nlimb = min(nlimb, 3)
    if x_abs_max is None:
        x_abs_max = jnp.max(jnp.abs(values.hi))

    e = _exp_of_max(x_abs_max)
    # scale so |x| < 2^12 (symmetric clip so s * inv_s == 1 exactly)
    sexp = jnp.clip(12 - e, -126, 126)
    s = _pow2_exact(sexp)
    x = df.scale_pow2(values, s)

    planes = []
    for _ in range(nlimb):
        limb = jnp.round(x.hi)
        planes.append(limb.astype(jnp.int32))
        x = df.add_f32(x, -limb)  # exact: |x.hi - limb| <= 0.5
        x = df.scale_pow2(x, float(2**_LIMB_BITS))
    # ONE row-payload scatter instead of nlimb separate scatters (the
    # scatter op dominates the Fock accumulation cost on TPU)
    payload = jnp.stack(planes, axis=-1)  # (N, nlimb) int32
    acc = jnp.zeros((size + 1, nlimb), jnp.int32).at[idx].add(payload)
    return acc[:size].T, sexp


def limbs_to_df64(limbs, sexp) -> DF64:
    """Stage 2: reassemble limb accumulators into a DF64 array."""
    total = None
    inv_s = _pow2_exact(-sexp)
    for k in range(limbs.shape[0]):
        acc = limbs[k]
        # int32 -> exact DF64 (split into two <2^18 halves)
        hi_part = acc >> _LIMB_BITS
        lo_part = acc - (hi_part << _LIMB_BITS)
        val = df.add_f32(
            df.mul_f32(
                df.from_f32(hi_part.astype(jnp.float32)), float(2**_LIMB_BITS)
            ),
            lo_part.astype(jnp.float32),
        )
        # scale back: * 2^{-13k} / s
        scale_back = float(2.0 ** (-_LIMB_BITS * k))
        val = df.mul_f32(val, scale_back)
        val = DF64(val.hi * inv_s, val.lo * inv_s)
        total = val if total is None else df.add(total, val)
    return total


def block_accumulate(values, rowkey, nrows: int, x_abs_max, nlimb: int = None,
                     axis_name=None):
    """Exact deterministic segment accumulation via int8 MXU matmul.

    ``values``: (T, nf) DF64 or f32; ``rowkey``: (T,) int32 in
    [0, nrows) (or >= nrows for padding -- routed to a dropped spill
    row).  Returns a DF64 (nrows, nf) array with
    ``out[r] = sum_{t: rowkey[t]==r} values[t]`` computed EXACTLY:
    values are decomposed into 7-bit int8 limbs (error-free peeling,
    scaled by the rigorous bound ``x_abs_max``), accumulated by an
    int8 x int8 -> int32 one-hot matmul on the MXU (integer adds:
    associative, so bit-deterministic), and reassembled in DF64.

    This is the TPU-native replacement for the per-element scatter-add
    when contributions can be tile-grouped into a SMALL per-chunk row
    space (scf/jk_contracted.py block-accumulation plan): the reference
    leans on CUDA atomicAdd for the same job (jk/1q1t.cu:423-643); TPUs
    have no atomics, and XLA scatter serializes per row -- but the MXU
    sums 8192-term one-hot products at full throughput.

    Headroom: |limb| <= 127 and the int32 sums must reconvert to f32
    EXACTLY, so T*127 < 2^24 -> T <= 2^17 tasks per call.
    """
    if not isinstance(values, DF64):
        values = df.from_f32(values)
        nlimb = 6 if nlimb is None else min(nlimb, 6)
    if nlimb is None:
        nlimb = 10  # 70 bits below the bound: beyond the DF64 tier target
    T = values.hi.shape[0]
    assert T <= (1 << 17), "exact-f32 reconversion headroom (T*127 < 2^24)"

    e = _exp_of_max(x_abs_max)
    sexp = jnp.clip(6 - e, -126, 126)  # |x| < 2^6 -> first limb fits int8
    s = _pow2_exact(sexp)
    x = df.scale_pow2(values, s)

    planes = []
    for _ in range(nlimb):
        limb = jnp.round(x.hi)
        planes.append(limb.astype(jnp.int8))
        x = df.add_f32(x, -limb)  # exact: |x.hi - limb| <= 0.5
        x = df.scale_pow2(x, 128.0)
    L = jnp.stack(planes, axis=-1).reshape(T, -1)  # (T, nf*nlimb) int8

    rows = jax.lax.broadcasted_iota(jnp.int32, (nrows + 1, 1), 0)
    onehot = (rowkey[None, :] == rows).astype(jnp.int8)  # (nrows+1, T)
    acc = jax.lax.dot_general(
        onehot, L, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (nrows+1, nf*nlimb) exact integer sums
    if axis_name is not None:
        # multi-chip: combine the per-device partial block sums while
        # still integers -- exact, so the reassembled blocks (and thus
        # everything downstream) are bit-identical to a single chip
        # processing the whole chunk.  Headroom: the psum'd acc equals
        # the single-chip acc of the full chunk (< B_full * 127 < 2^24).
        acc = jax.lax.psum(acc, axis_name)
    acc = acc[:nrows].reshape(nrows, values.hi.shape[1], nlimb)

    inv_s = _pow2_exact(-sexp)
    total = None
    for k in range(nlimb):
        # int32 (< 2^23) -> exact f32 -> DF64, scaled back by 2^{-7k}/s
        val = df.from_f32(acc[..., k].astype(jnp.float32))
        val = df.mul_f32(val, float(2.0 ** (-7 * k)))
        val = DF64(val.hi * inv_s, val.lo * inv_s)
        total = val if total is None else df.add(total, val)
    return total


def scatter_add_det(values, idx, size: int, nlimb: int = 5) -> DF64:
    """Deterministic scatter-add: out[idx[n]] += values[n].

    values: DF64 (or plain f32 array) of shape (N,); idx: int32 (N,);
    returns a DF64 array of shape (size,).  Contributions with
    idx == size are dropped (padding convention: point pad tasks at
    ``size`` and allocate one scratch slot).
    """
    limbs, sexp = scatter_limbs(values, idx, size, nlimb)
    return limbs_to_df64(limbs, sexp)


def scatter_add_det_2d(values, idx, shape, nlimb: int = 5) -> DF64:
    """Scatter into a 2D (n, m) DF64 output with flat indices."""
    n, m = shape
    flat = scatter_add_det(values, idx, n * m, nlimb)
    return DF64(flat.hi.reshape(n, m), flat.lo.reshape(n, m))


__all__ = [
    "scatter_add_det",
    "scatter_add_det_2d",
    "scatter_limbs",
    "limbs_to_df64",
    "block_accumulate",
]
