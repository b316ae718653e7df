"""Bilinear tile accumulation: scatter-free Fock assembly on the MXU.

The Fock accumulation problem: every screened shell quartet contributes
six small dense blocks (ab/cd/ac/ad/bc/bd) into the (nao, nao) output.
The reference resolves the index indirection with CUDA ``atomicAdd``
(/root/reference/jqc/backend/jk/1q1t.cu:423-643).  TPUs have no atomics;
XLA's scatter serializes (~40 M rows/s measured -- the round-3 bench
ceiling), and one-hot segment reduction over a flat row space does
``nrows x T`` MAC work, which at the measured tile occupancy is MORE
arithmetic than the ERI itself.

This kernel exploits the factorization of the target index: a
contribution of stream xy goes to element (i_t, j_t) of the dense
(class_x shells x class_y shells) block, so the scatter is a BILINEAR
one-hot product

    OUT[i, j, f] = sum_t A[i, t] * B[j, t] * V[t, f]

with A/B one-hot over WITHIN-SUPERTILE shell indices (width W <= 64),
computed as (B-expanded odot L) @ A^T on the MXU: ~W_x * W_y * nf *
nlimb MACs per task (~1-10 ns/task at v5e MXU rates, 100-1000x the XLA
scatter throughput) -- and the output is DENSE: no scatter anywhere
(per-class dense blocks are placed into the Fock matrix once per call).

Exactness/determinism: values are peeled into 7-bit limbs (error-free),
one-hot products are 0/limb (limbs <= 127, exact in bf16), and the f32
matmul accumulations stay exact while sums < 2^24 (enforced: chunk *
127 < 2^24).  Cross-chunk accumulation is int32 (associative), so the
result is bit-deterministic and multi-chip psum-able, like ops/accum.py.

Mosaic layout rules obeyed throughout (learned the hard way): every
in-kernel array is 2D (rows, ts) with rows a multiple of 8; row
manipulations are constant 0/1 selection MATMULS, aligned slab slices,
or major-dim concats -- never per-row slices, never reshapes or
broadcasts across the tiled dims.  Index vectors arrive pre-shaped
(1, T) from XLA.
"""

from __future__ import annotations

import os
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from . import df64 as df
from .accum import _exp_of_max
from .df64 import DF64, _pow2_exact

_LANE = 128
# task-slice width (multiple of 8*128 keeps every block aligned)
_TS = int(os.environ.get("JQC_TILE_TS", "1024"))
# CT-operand VMEM budget (bytes, bf16): (Wy*nlimb*A8) x ts per grid step.
# Floor cost is Wy*nlimb*8*ts*2 (components pad to 8 rows) = 6.3 MB at
# Wy=64/nlimb=6/ts=1024, so the budget must sit above the df64 floor.
_C_BUDGET = int(os.environ.get("JQC_TILE_C_BUDGET", str(12 << 20)))


def _r8(n):
    return -(-n // 8) * 8


def _pick_nfc(nf, Wy, nlimb, ts):
    """Components per f-chunk: the (Wy*nlimb*r8(nfc), ts) bf16 CT operand
    must fit the VMEM budget."""
    nfc = nf
    while nfc > 1 and Wy * nlimb * _r8(nfc) * ts * 2 > _C_BUDGET:
        nfc -= 1
    return nfc


def _peel_limbs_planes(values, scale, nlimb, nfc):
    """XLA-side error-free limb peel -> (nsteps_f * nlimb * A8, T) bf16.

    Row layout per f-chunk: limb-major, component-minor, components
    padded to A8 = r8(nfc) rows (zero rows) so every in-kernel slab is
    8-aligned.
    """
    T, nf = values.hi.shape
    A8 = _r8(nfc)
    nsteps_f = -(-nf // nfc)
    x = df.scale_pow2(values, scale)
    planes = []
    for _ in range(nlimb):
        limb = jnp.round(x.hi)
        planes.append(limb)
        x = df.add_f32(x, -limb)
        x = df.scale_pow2(x, 128.0)
    L = jnp.stack(planes)  # (nlimb, T, nf)
    L = jnp.moveaxis(L, 1, 2)  # (nlimb, nf, T)
    pad_f = nsteps_f * nfc - nf
    if pad_f:
        L = jnp.concatenate(
            [L, jnp.zeros((nlimb, pad_f, T), jnp.float32)], axis=1
        )
    L = L.reshape(nlimb, nsteps_f, nfc, T)
    if A8 != nfc:
        L = jnp.concatenate(
            [L, jnp.zeros((nlimb, nsteps_f, A8 - nfc, T), jnp.float32)],
            axis=2,
        )
    # (nsteps_f, nlimb, A8, T) -> rows (k*A8 + a) per chunk
    L = jnp.moveaxis(L, 1, 0).reshape(nsteps_f * nlimb * A8, T)
    return L.astype(jnp.bfloat16), nsteps_f, A8


@lru_cache(maxsize=None)
def _tile_kernel(Wx, Wy, nlA8, ts):
    from jax.experimental import pallas as pl

    R = Wy * nlA8

    def kernel(l_ref, iyr_ref, ixc_ref, out_ref):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        LB = jnp.concatenate([l_ref[...]] * Wy)  # (R, ts), j-major rows
        jr = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0) // nlA8
        OHB = (iyr_ref[...] == jr).astype(jnp.bfloat16)  # (R, ts)
        CT = OHB * LB
        # x one-hot TASK-MAJOR (ts, Wx) so the dot is the natural
        # (M,K)@(K,N) form -- the NT form (contracting both lane dims)
        # hangs the Mosaic compile (measured: /tmp/bisect_tile.py dotonly)
        ax = jax.lax.broadcasted_iota(jnp.int32, (1, Wx), 1)
        A = (ixc_ref[...] == ax).astype(jnp.bfloat16)  # (ts, Wx)
        out_ref[...] += jax.lax.dot_general(
            CT, A, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    return kernel


def tile_accumulate(values, ix, iy, Wx: int, Wy: int, x_abs_max,
                    nlimb: int | None = None):
    """One stream's chunk contributions -> dense (Wx, Wy, nf) limb tile.

    values: (T, nf) DF64 or f32; ix/iy: (T,) int32 within-supertile shell
    indices in [0, Wx)/[0, Wy) (every task of the chunk must belong to
    ONE supertile pair -- the plan guarantees it).  Returns an
    (Wx, Wy, nf, nlimb) f32 array of EXACT integer limb sums (< 2^24)
    plus the scale exponent sexp: out[i,j,f] = sum over limbs k of
    limbs[i,j,f,k] * 2^{-7k} / 2^sexp.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if not isinstance(values, DF64):
        values = df.from_f32(values)
        nlimb = 6 if nlimb is None else min(nlimb, 6)
    if nlimb is None:
        nlimb = 10
    T, nf = values.hi.shape
    assert T * 127 < (1 << 24)
    ts = min(_TS, T)
    assert T % ts == 0 and (ts % (8 * _LANE) == 0 or ts == T), (T, ts)

    e = _exp_of_max(x_abs_max)
    sexp = jnp.clip(6 - e, -126, 126)
    scale = _pow2_exact(sexp)

    nfc = _pick_nfc(nf, Wy, nlimb, ts)
    L, nsteps_f, A8 = _peel_limbs_planes(values, scale, nlimb, nfc)
    nlA8 = nlimb * A8

    iyr = iy.reshape(1, T)
    ixc = ix.reshape(T, 1)

    kernel = _tile_kernel(Wx, Wy, nlA8, ts)
    R = Wy * nlA8
    out = pl.pallas_call(
        kernel,
        grid=(nsteps_f, T // ts),
        in_specs=[
            pl.BlockSpec((nlA8, ts), lambda f, t: (f, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ts), lambda f, t: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ts, 1), lambda f, t: (t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, R, Wx), lambda f, t: (f, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nsteps_f, R, Wx), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
        interpret=jax.default_backend() == "cpu",
    )(L, iyr, ixc)

    # (nsteps_f, Wy, nlimb, A8, Wx) -> (Wx, Wy, nf, nlimb)
    out = out.reshape(nsteps_f, Wy, nlimb, A8, Wx)
    out = jnp.transpose(out, (4, 1, 0, 3, 2)).reshape(
        Wx, Wy, nsteps_f * A8, nlimb
    )
    if A8 != nfc:
        keep = (
            np.arange(nsteps_f)[:, None] * A8 + np.arange(nfc)[None, :]
        ).reshape(-1)[:nf]
        out = out[:, :, keep]
    else:
        out = out[:, :, :nf]
    return out, sexp


@lru_cache(maxsize=None)
def _fused_kernel(Wx, Wy, nfo, nfc, nlimb, ts, isdf):
    from jax.experimental import pallas as pl

    A8 = _r8(nfc)
    nlA8 = nlimb * A8
    R = Wy * nlA8
    O8 = _r8(nfo)
    G8 = nfo * A8  # g slab rows per f-chunk (o-major, A8 comps each)

    def kernel(scale_ref, g_ref, glo_ref, dt_ref, dtlo_ref,
               ixc_ref, iyr_ref, out_ref):
        t = pl.program_id(1)
        s = scale_ref[0, 0]  # f32 power of two (scalar bitcast is
        # unsupported in Mosaic; _pow2_exact runs outside)

        @pl.when(t == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        # ---- expand dm rows (O8, ts) -> (G8, ts), o-major A8-replicated
        # rows, via a constant 0/1 selection matmul (EXACT: one term per
        # output row).  The dm values themselves were gathered in XLA --
        # no in-kernel dm-tile selection (the v3 one-hot dm machinery
        # cost ~1.6M MACs/task at high l; this is O(G8*O8) ~ 24k).
        ro = jax.lax.broadcasted_iota(jnp.int32, (G8, 1), 0) // A8
        co = jax.lax.broadcasted_iota(jnp.int32, (1, O8), 1)
        REP = (ro == co).astype(jnp.float32)  # (G8, O8)
        # precision=HIGHEST: the default TPU MXU f32 matmul truncates
        # operands to bf16 passes, silently rounding the dm values
        # (measured 2^-9-level error on chip); with HIGHEST the 0/1
        # selection is exact (one term per output row)
        DT = jnp.dot(REP, dt_ref[...], preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        if isdf:
            DTlo = jnp.dot(REP, dtlo_ref[...],
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)

        # ---- contraction: V[a, tau] = sum_o G[(o,a), tau] * DT[o, tau]
        v = None
        for o in range(nfo):
            sl = slice(o * A8, (o + 1) * A8)
            if isdf:
                g = DF64(g_ref[sl], glo_ref[sl])
                dt = DF64(DT[sl], DTlo[sl])
                term = df.mul(g, dt)
                v = term if v is None else df.add(v, term)
            else:
                term = g_ref[sl] * DT[sl]
                v = term if v is None else v + term
        x = v if isdf else df.from_f32(v)  # (A8, ts)

        # ---- limb peel -> (nlimb*A8, ts), limb-major rows ----
        x = df.scale_pow2(x, s)
        limbs = []
        for _ in range(nlimb):
            limb = jnp.round(x.hi)
            limbs.append(limb)
            x = df.add_f32(x, -limb)
            x = df.scale_pow2(x, 128.0)
        LT = jnp.concatenate(limbs).astype(jnp.bfloat16)  # (nlA8, ts)

        # ---- bilinear accumulation ----
        LB = jnp.concatenate([LT] * Wy)  # (R, ts), j-major
        jr = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0) // nlA8
        OHB = (iyr_ref[...] == jr).astype(jnp.bfloat16)
        CT = OHB * LB
        # x one-hot TASK-MAJOR: natural-form dot (NT hangs Mosaic,
        # see _tile_kernel)
        ax = jax.lax.broadcasted_iota(jnp.int32, (1, Wx), 1)
        A = (ixc_ref[...] == ax).astype(jnp.bfloat16)  # (ts, Wx)
        out_ref[...] += jax.lax.dot_general(
            CT, A, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    return kernel


def fused_contract_tile(G, dt, lx, ly, Wx, Wy, x_abs_max,
                        nlimb: int | None = None):
    """One stream's chunk: contract G with per-task dm rows and
    accumulate into the dense (Wx, Wy) supertile block -- one Pallas
    kernel, no scatters.

    G: (T, nfxy, nfo) DF64 or f32 -- the stream-permuted, symmetry-
    weighted ERI blocks (nfxy output components, nfo contracted).
    dt: (r8(nfo), T) f32 or DF64 -- the per-task dm rows of the
    complement centers (gathered + transposed in XLA; rows beyond nfo
    are ignored).  lx/ly: (T,) int32 within-tile shell indices in
    [0, Wx) / [0, Wy).  Returns ((Wx, Wy, nfxy, nlimb) f32 exact
    integer limb sums, sexp); accumulate across chunks in int32.

    Replaces _contract_blocks' bmv + scatter_limbs for tile-grouped
    plans (reference contrast: per-thread dm loads + atomicAdd,
    jk/1q1t.cu:423-643).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    isdf = isinstance(G, DF64)
    if not isdf and nlimb is None:
        nlimb = 6
    if nlimb is None:
        nlimb = 10
    T, nfxy, nfo = (G.hi if isdf else G).shape
    assert T * 127 < (1 << 24)
    ts = min(_TS, T)
    assert T % ts == 0 and (ts % (8 * _LANE) == 0 or ts == T), (T, ts)
    O8 = _r8(nfo)
    assert (dt.hi if isdf else dt).shape == (O8, T)
    nfc = _pick_nfc(nfxy, Wy, nlimb, ts)
    A8 = _r8(nfc)
    nsteps_f = -(-nfxy // nfc)
    G8 = nfo * A8

    e = _exp_of_max(x_abs_max)
    sexp = jnp.clip(6 - e, -126, 126)
    scale = _pow2_exact(sexp).reshape(1, 1)

    def planes(x):
        # (T, nfxy, nfo) -> (nsteps_f * nfo * A8, T): per f-chunk,
        # o-major slabs of A8 component rows (zero-padded)
        p = jnp.moveaxis(x, 0, 2)  # (nfxy, nfo, T)
        pad_f = nsteps_f * nfc - nfxy
        if pad_f:
            p = jnp.concatenate(
                [p, jnp.zeros((pad_f, nfo, T), jnp.float32)]
            )
        p = p.reshape(nsteps_f, nfc, nfo, T)
        if A8 != nfc:
            p = jnp.concatenate(
                [p, jnp.zeros((nsteps_f, A8 - nfc, nfo, T), jnp.float32)],
                axis=1,
            )
        p = jnp.moveaxis(p, 1, 2)  # (nsteps_f, nfo, A8, T)
        return p.reshape(nsteps_f * G8, T)

    ghi = planes(G.hi if isdf else G)
    glo = planes(G.lo) if isdf else ghi[:1]
    dthi = dt.hi if isdf else dt
    dtlo = dt.lo if isdf else dthi[:1]

    ixc = lx.reshape(T, 1)
    iyr = ly.reshape(1, T)

    kernel = _fused_kernel(Wx, Wy, nfo, nfc, nlimb, ts, isdf)
    nlA8 = nlimb * A8
    R = Wy * nlA8
    row_spec = pl.BlockSpec((1, ts), lambda f, t: (0, t),
                            memory_space=pltpu.VMEM)
    col_spec = pl.BlockSpec((ts, 1), lambda f, t: (t, 0),
                            memory_space=pltpu.VMEM)
    g_spec = pl.BlockSpec((G8, ts), lambda f, t: (f, t),
                          memory_space=pltpu.VMEM)
    dt_spec = pl.BlockSpec((O8, ts), lambda f, t: (0, t),
                           memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(nsteps_f, T // ts),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            g_spec,
            g_spec if isdf else pl.BlockSpec(
                (1, ts), lambda f, t: (0, t), memory_space=pltpu.VMEM
            ),
            dt_spec,
            dt_spec if isdf else pl.BlockSpec(
                (1, ts), lambda f, t: (0, t), memory_space=pltpu.VMEM
            ),
            col_spec, row_spec,
        ],
        out_specs=pl.BlockSpec((1, R, Wx), lambda f, t: (f, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nsteps_f, R, Wx), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
        interpret=jax.default_backend() == "cpu",
    )(scale, ghi, glo, dthi, dtlo, ixc, iyr)

    out = out.reshape(nsteps_f, Wy, nlimb, A8, Wx)
    out = jnp.transpose(out, (4, 1, 0, 3, 2)).reshape(
        Wx, Wy, nsteps_f * A8, nlimb
    )
    if A8 != nfc:
        keep = (
            np.arange(nsteps_f)[:, None] * A8 + np.arange(nfc)[None, :]
        ).reshape(-1)[:nfxy]
        out = out[:, :, keep]
    else:
        out = out[:, :, :nfxy]
    return out, sexp


def dm_rows_t(vals, nfo):
    """XLA helper: gathered per-task dm rows (T, nfo) -> the (r8(nfo), T)
    transposed, row-padded layout ``fused_contract_tile`` expects."""
    O8 = _r8(nfo)

    def one(v):
        r = v.T
        if O8 != nfo:
            r = jnp.concatenate(
                [r, jnp.zeros((O8 - nfo, r.shape[1]), r.dtype)]
            )
        return r

    if isinstance(vals, DF64):
        return DF64(one(vals.hi), one(vals.lo))
    return one(vals)


def tile_limbs_to_df64(acc_int32, sexp) -> DF64:
    """Reassemble an int32 limb-tile accumulator into DF64.

    acc_int32: (..., nlimb) int32 (sums < 2^31; each limb plane exact in
    two f32 halves).  Mirrors ops/accum.py::limbs_to_df64.
    """
    nlimb = acc_int32.shape[-1]
    inv_s = _pow2_exact(-sexp)
    total = None
    for k in range(nlimb):
        a = acc_int32[..., k]
        hi_part = a >> 12
        lo_part = a - (hi_part << 12)
        val = df.add_f32(
            df.mul_f32(df.from_f32(hi_part.astype(jnp.float32)),
                       float(2**12)),
            lo_part.astype(jnp.float32),
        )
        val = df.mul_f32(val, float(2.0 ** (-7 * k)))
        val = DF64(val.hi * inv_s, val.lo * inv_s)
        total = val if total is None else df.add(total, val)
    return total


__all__ = [
    "tile_accumulate",
    "fused_contract_tile",
    "dm_tile_t",
    "tile_limbs_to_df64",
]
