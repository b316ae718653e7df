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

    def kernel(l_ref, iyr_ref, ixr_ref, out_ref):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        LB = jnp.concatenate([l_ref[...]] * Wy)  # (R, ts), j-major rows
        jr = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0) // nlA8
        OHB = (iyr_ref[...] == jr).astype(jnp.bfloat16)  # (R, ts)
        CT = OHB * LB
        ax = jax.lax.broadcasted_iota(jnp.int32, (Wx, 1), 0)
        A = (ixr_ref[...] == ax).astype(jnp.bfloat16)  # (Wx, ts)
        out_ref[...] += jax.lax.dot_general(
            CT, A, (((1,), (1,)), ((), ())),
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
    ixr = ix.reshape(1, T)

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
            pl.BlockSpec((1, ts), lambda f, t: (0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, R, Wx), lambda f, t: (f, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nsteps_f, R, Wx), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
        interpret=jax.default_backend() == "cpu",
    )(L, iyr, ixr)

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


def _bf16_planes(x):
    """Split f32 -> 3 bf16 planes summing EXACTLY to x (8+8+8 mantissa)."""
    hi = x.astype(jnp.bfloat16)
    r = x - hi.astype(jnp.float32)
    mid = r.astype(jnp.bfloat16)
    lo = (r - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


@lru_cache(maxsize=None)
def _fused_kernel(Wx, Wy, Wu, Wv, nfo, nfc, nlimb, ts, isdf, ndp):
    from jax.experimental import pallas as pl

    A8 = _r8(nfc)
    nlA8 = nlimb * A8
    R = Wy * nlA8
    O8 = _r8(nfo)
    G8 = nfo * A8  # g slab rows per f-chunk (o-major, A8 comps each)

    def kernel(scale_ref, g_ref, glo_ref, d_ref, ixr_ref, iyr_ref,
               iur_ref, ivr_ref, out_ref):
        t = pl.program_id(1)
        s = scale_ref[0, 0]  # f32 power of two (scalar bitcast is
        # unsupported in Mosaic; _pow2_exact runs outside)

        @pl.when(t == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        # ---- one-hot dm-row selection (dense dm tile, no gathers) ----
        au = jax.lax.broadcasted_iota(jnp.int32, (Wu, 1), 0)
        OHu = (iur_ref[...] == au).astype(jnp.bfloat16)  # (Wu, ts)
        # P[(v,o), tau] = dsel * (iv_tau == v): rows v-major o-minor
        rv = jax.lax.broadcasted_iota(jnp.int32, (Wv * O8, 1), 0) // O8
        OHV = (ivr_ref[...] == rv).astype(jnp.float32)  # (Wv*O8, ts)
        # constant selector: DTB[(o, a), (v, o')] = (o == o')
        ro = jax.lax.broadcasted_iota(jnp.int32, (G8, 1), 0) // A8
        co = jax.lax.broadcasted_iota(
            jnp.int32, (1, Wv * O8), 1
        ) % O8
        REP = (ro == co).astype(jnp.bfloat16)  # (G8, Wv*O8)

        dtb = []
        for p in range(ndp):
            dsel = None
            for q in range(3):
                part = jnp.dot(d_ref[p * 3 + q], OHu,
                               preferred_element_type=jnp.float32)
                dsel = part if dsel is None else dsel + part
            Pm = OHV * dsel  # exact: one nonzero (v) per (o, tau)
            # DTBIG[(o,a), tau] = dm value of complement row o, task tau
            dtb.append(jnp.dot(REP, Pm,
                               preferred_element_type=jnp.float32))

        # ---- contraction: V[(a), tau] = sum_o G[(o,a), tau]*DT ----
        v = None
        for o in range(nfo):
            sl = slice(o * A8, (o + 1) * A8)
            if isdf:
                g = DF64(g_ref[sl], glo_ref[sl])
                dt = DF64(dtb[0][sl], dtb[1][sl])
                term = df.mul(g, dt)
                v = term if v is None else df.add(v, term)
            else:
                term = g_ref[sl] * dtb[0][sl]
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
        ax = jax.lax.broadcasted_iota(jnp.int32, (Wx, 1), 0)
        A = (ixr_ref[...] == ax).astype(jnp.bfloat16)
        out_ref[...] += jax.lax.dot_general(
            CT, A, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    return kernel


def fused_contract_tile(G, dtile_t, lx, ly, lu, lv, Wx, Wy, Wu, Wv,
                        x_abs_max, nlimb: int | None = None):
    """One stream's chunk: contract G with a dense dm tile and
    accumulate into the (Wx, Wy) supertile block -- one Pallas kernel,
    no gathers, no scatters.

    G: (T, nfxy, nfo) DF64 or f32 -- the stream-permuted, symmetry-
    weighted ERI blocks (nfxy output components, nfo contracted).
    dtile_t: (Wv*r8(nfo), Wu) f32 or DF64 -- the complement-pair dense
    dm tile TRANSPOSED, rows (v-major, o-minor padded to r8(nfo)) with
    o = fu*nfv + fv over the complement centers' components.
    lx/ly/lu/lv: (T,) int32 within-tile shell indices.  Returns
    ((Wx, Wy, nfxy, nlimb) f32 exact integer limb sums, sexp);
    accumulate across chunks in int32.

    Replaces _contract_blocks + scatter_limbs for tile-grouped plans:
    dm rows come from one-hot MXU products against the exact
    3x-bf16-plane split of the tile (reference contrast: per-thread
    global-memory dm loads + atomicAdd, jk/1q1t.cu:423-643).
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
    assert (dtile_t.hi if isdf else dtile_t).shape == (Wv * O8, Wu)
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

    dparts = (dtile_t.hi, dtile_t.lo) if isdf else (dtile_t,)
    ndp = len(dparts)
    dpl = jnp.stack(
        [pl_ for part in dparts for pl_ in _bf16_planes(part)]
    )  # (ndp*3, Wv*O8, Wu)

    ixr = lx.reshape(1, T)
    iyr = ly.reshape(1, T)
    iur = lu.reshape(1, T)
    ivr = lv.reshape(1, T)

    kernel = _fused_kernel(Wx, Wy, Wu, Wv, nfo, nfc, nlimb, ts, isdf, ndp)
    nlA8 = nlimb * A8
    R = Wy * nlA8
    row_spec = pl.BlockSpec((1, ts), lambda f, t: (0, t),
                            memory_space=pltpu.VMEM)
    g_spec = pl.BlockSpec((G8, ts), lambda f, t: (f, t),
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
            pl.BlockSpec(memory_space=pltpu.VMEM),
            row_spec, row_spec, row_spec, row_spec,
        ],
        out_specs=pl.BlockSpec((1, R, Wx), lambda f, t: (f, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nsteps_f, R, Wx), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
        interpret=jax.default_backend() == "cpu",
    )(scale, ghi, glo, dpl, ixr, iyr, iur, ivr)

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


def dm_tile_t(block, Wu, Wv, nfu, nfv):
    """Host/XLA helper: (Wu*nfu, Wv*nfv) dense dm block -> the
    (Wv*r8(nfu*nfv), Wu) TRANSPOSED row layout ``fused_contract_tile``
    expects (rows v-major, o = fu*nfv + fv minor, padded to r8)."""
    nfo = nfu * nfv
    O8 = _r8(nfo)

    def one(b):
        b4 = b.reshape(Wu, nfu, Wv, nfv)
        rows = jnp.transpose(b4, (2, 1, 3, 0)).reshape(Wv, nfo, Wu)
        if O8 != nfo:
            rows = jnp.concatenate(
                [rows, jnp.zeros((Wv, O8 - nfo, Wu), b.dtype)], axis=1
            )
        return rows.reshape(Wv * O8, Wu)

    if isinstance(block, DF64):
        return DF64(one(block.hi), one(block.lo))
    return one(block)


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
