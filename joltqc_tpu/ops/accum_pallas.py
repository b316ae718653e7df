"""Pallas TPU kernel for the exact one-hot block accumulation.

``ops/accum.py::block_accumulate`` is the XLA reference: it materializes
the (nrows, T) one-hot matrix to HBM (~tens of MB per chunk) before the
MXU matmul.  This kernel builds the one-hot in VMEM per task slice and
accumulates the (nrows, nf*nlimb) integer planes in a revisited VMEM
output, so HBM traffic collapses to the values in and the block rows
out.

Exactness: 7-bit limb peeling is error-free; the one-hot products are
0/limb (limbs <= 127, exact in bf16); the f32 accumulation of those
products stays exact while the running sums are < 2^24 (enforced:
T*127 < 2^24).  The MXU reduction order is fixed -> bit-deterministic.
"""

from __future__ import annotations

import os
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from . import df64 as df
from .df64 import DF64, _pow2_exact

_LANE = 128
# one-hot VMEM budget: nrows * ts * 2 bytes (bf16) <= ~4 MB
_ONEHOT_ELEMS = int(os.environ.get("JQC_ACCUM_ONEHOT_ELEMS", str(2 << 20)))


@lru_cache(maxsize=None)
def _accum_kernel(nrows, nf, nlimb, T2, ts2, isdf):
    from jax.experimental import pallas as pl

    nfl = nf * nlimb

    def kernel(scale_ref, vhi_ref, vlo_ref, key_ref, out_ref):
        step = pl.program_id(0)
        s = scale_ref[0, 0]  # f32 power of two (scalar bitcast is not
        # supported in Mosaic; _pow2_exact runs outside the kernel)

        @pl.when(step == 0)
        def _():
            out_ref[...] = jnp.zeros((nrows, nfl), jnp.float32)

        # (nf, ts2, LANE) slice -> 7-bit limb planes, exact peeling
        limbs = []
        for f in range(nf):
            if isdf:
                x = DF64(vhi_ref[f], vlo_ref[f])
            else:
                x = df.from_f32(vhi_ref[f])
            x = df.scale_pow2(x, s)
            for _ in range(nlimb):
                limb = jnp.round(x.hi)
                limbs.append(limb)
                x = df.add_f32(x, -limb)
                x = df.scale_pow2(x, 128.0)
        # (ts, nfl) bf16 operand (limbs are integers <= 127: exact)
        L = jnp.stack(limbs, axis=-1).reshape(ts2 * _LANE, nfl)
        L = L.astype(jnp.bfloat16)

        keys = key_ref[...].reshape(1, ts2 * _LANE)
        rows = jax.lax.broadcasted_iota(jnp.int32, (nrows, 1), 0)
        onehot = (keys == rows).astype(jnp.bfloat16)  # (nrows, ts) in VMEM

        out_ref[...] += jnp.dot(
            onehot, L, preferred_element_type=jnp.float32
        )

    return kernel


def pallas_accum_ok(T: int, nrows: int) -> bool:
    """Shape support check: the task-slice width must satisfy the TPU
    block alignment (multiple of 8 sublanes, or the full task axis)."""
    if T % _LANE or T * 127 >= (1 << 24):
        return False
    T2 = T // _LANE
    ts2 = max(1, min(T2, _ONEHOT_ELEMS // max(nrows * _LANE, 1)))
    while T2 % ts2:
        ts2 -= 1
    return ts2 % 8 == 0 or ts2 == T2


def block_accumulate_pallas(values, rowkey, nrows: int, x_abs_max,
                            nlimb: int = None, axis_name=None):
    """Drop-in for ops/accum.py::block_accumulate (same contract)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    isdf = isinstance(values, DF64)
    if not isdf:
        values = df.from_f32(values)
        nlimb = 6 if nlimb is None else min(nlimb, 6)
    if nlimb is None:
        nlimb = 10
    T, nf = values.hi.shape
    assert T % _LANE == 0 and T * 127 < (1 << 24)
    T2 = T // _LANE

    # task-slice width: keep the VMEM one-hot under budget
    ts2 = max(1, min(T2, _ONEHOT_ELEMS // max(nrows * _LANE, 1)))
    while T2 % ts2:
        ts2 -= 1
    nsteps = T2 // ts2

    from .accum import _exp_of_max

    e = _exp_of_max(x_abs_max)
    sexp = jnp.clip(6 - e, -126, 126).reshape(1, 1)
    scale = _pow2_exact(sexp)

    # (nf, T2, LANE) layout: minor dims are the task batch
    vhi = jnp.moveaxis(values.hi, 0, 1).reshape(nf, T2, _LANE)
    vlo = jnp.moveaxis(values.lo, 0, 1).reshape(nf, T2, _LANE)
    key2 = rowkey.reshape(T2, _LANE)

    kernel = _accum_kernel(nrows, nf, nlimb, T2, ts2, isdf)
    nfl = nf * nlimb

    acc = pl.pallas_call(
        kernel,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((nf, ts2, _LANE), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nf, ts2, _LANE), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ts2, _LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nrows, nfl), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nrows, nfl), jnp.float32),
        interpret=jax.default_backend() == "cpu",
    )(scale, vhi, vlo, key2)

    if axis_name is not None:
        # exact integer psum of the per-device partial block sums (cast
        # through int32: f32 adds above 2^24 would round)
        acc = jax.lax.psum(acc.astype(jnp.int32), axis_name).astype(
            jnp.float32
        )
    acc = acc.reshape(nrows, nf, nlimb)
    inv_s = _pow2_exact(-sexp[0, 0])
    total = None
    for k in range(nlimb):
        val = df.from_f32(acc[..., k])  # exact: sums < 2^24
        val = df.mul_f32(val, float(2.0 ** (-7 * k)))
        val = DF64(val.hi * inv_s, val.lo * inv_s)
        total = val if total is None else df.add(total, val)
    return total


__all__ = ["block_accumulate_pallas"]
