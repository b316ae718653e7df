"""Pallas TPU kernel for contracted ERI class batches.

WHY THIS EXISTS.  Round-2 profiling showed the pure-XLA scalarized ERI
pipeline (ops/eri.py + ops/md.py) running ~100-150x below VPU peak even
though it is neither flop- nor loop-bound: the per-primitive-quartet
chain is hundreds of elementwise ops with high fan-out (E and R values
feed many assembly FMAs), and XLA materializes most of those
intermediates to HBM instead of fusing, so every op pays an HBM round
trip on a multi-MB array.  This kernel runs the SAME scalarized
McMurchie-Davidson chain (ops/md.py::eri_scalar_g_rows -- shared code,
one source of truth) inside a single Pallas program whose intermediates
all live in VMEM/registers: HBM traffic collapses to the task geometry
in and the ERI block out, which is ~150 flops/byte of arithmetic
intensity -- firmly compute-bound.

Design (reference counterpart: the fully-unrolled per-thread register
kernels of /root/reference/jqc/backend/jk/1q1t.cu:173-408):
 - one pallas_call per (class, chunk); grid = primitive quartets (npq);
   the output ERI block is revisited every grid step and accumulated in
   VMEM (zero-filled at q == 0);
 - per-center geometry arrives as one stacked (3 + 2*nprim, T/128, 128)
   array per center (coords x,y,z then exponent slots then coefficient
   slots), so the kernel selects the primitive slot with a dynamic
   leading-dim index -- no gathers anywhere in the kernel;
 - the task batch T rides the (sublane, lane) grid as (T/128, 128):
   every op in the chain is a full-tile VPU op;
 - DF64 values are (hi, lo) float32 pairs in separate refs; the df64
   error-free transforms are plain elementwise ops and run unchanged
   inside the kernel.

High-l classes whose scalar assembly would explode the Mosaic program
(cost > JQC_PALLAS_ASM_MAX terms) and task batches not aligned to 128
fall back to the XLA path (ops/eri.py handles the dispatch).
"""

from __future__ import annotations

import os
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from . import df64 as df
from .arith import get_arith
from .harmonics import cart_components
from .md import eri_scalar_g_rows, make_pair_data_c, tri_set

_LANE = 128
# scalar-assembly term cap PER FRAGMENT program (Mosaic program size is
# roughly proportional; beyond this the compile time and instruction
# cache pressure outweigh the VMEM-residency win)
_PALLAS_ASM_MAX = int(os.environ.get("JQC_PALLAS_ASM_MAX", "20000"))
# max output fragments per class chunk: each fragment is its own
# pallas_call inside the traced scan body (no host dispatch), but the
# Hermite-R/E prelude is recomputed per fragment, so very-high-l classes
# whose assembly would need hundreds of fragments fall back to XLA
_PALLAS_MAX_FRAGS = int(os.environ.get("JQC_PALLAS_MAX_FRAGS", "24"))
# VMEM live-set budget (bytes) used by the static eligibility estimate
_VMEM_BUDGET = int(os.environ.get("JQC_PALLAS_VMEM", str(10 << 20)))
# Mosaic scoped-VMEM limit passed to the compiler.  The default scoped
# limit is 16 MB and the real stack need runs ~2x the static live-set
# estimate (measured: an 8.8 MB-estimate f32 class allocated 18.9 MB and
# OOMed the 16 MB default), so raise it well clear of the worst
# eligible class while leaving most of the 128 MB chip VMEM free.
_VMEM_LIMIT = int(os.environ.get("JQC_PALLAS_VMEM_LIMIT", str(64 << 20)))


def _nf(l):
    return len(cart_components(l))


def _class_dims(ls):
    lab, lcd = ls[0] + ls[1], ls[2] + ls[3]
    nfab = _nf(ls[0]) * _nf(ls[1])
    nfcd = _nf(ls[2]) * _nf(ls[3])
    NTab = len(tri_set(lab)[0])
    NTcd = len(tri_set(lcd)[0])
    return nfab, nfcd, NTab, NTcd


def _frag_live(tier, ls, Fab, Fcd, I, T):
    """VMEM live-set estimate (bytes) of one fragment program."""
    isdf = tier in ("df64", "fp64")
    NR = len(tri_set(sum(ls))[0])
    _, _, NTab, NTcd = _class_dims(ls)
    # out rows + S block + one fab's EB products + R dict (x2: the
    # recurrence keeps two levels live) + pair data / Boys transients
    live = Fab * Fcd + Fcd * I + I + 2 * NR + 64
    return live * T * 4 * (2 if isdf else 1)


@lru_cache(maxsize=None)
def _fragment_plan(tier, ls, T):
    """Output-fragment decomposition for one class, or None (XLA path).

    Each fragment is (fab0, fab1, fcd0, fcd1, itb0, itb1): the kernel
    assembles output components fab0:fab1 x fcd0:fcd1 restricted to
    bra-Hermite terms itb0:itb1; itb fragments are partial sums.  The
    TPU analogue of the reference's 1qnt fragment scheme solver
    (/root/reference/jqc/backend/jk_1qnt.py:71-170) -- but solved
    analytically against a program-size cap + VMEM budget instead of a
    per-device timing table.

    Fragmenting over fcd keeps the ket contraction S[itb][fcd] (the
    dominant cost at high l) un-duplicated; fab / itb splits are used
    only when a single fcd column still exceeds the caps.
    """
    nfab, nfcd, NTab, NTcd = _class_dims(ls)
    C = _PALLAS_ASM_MAX

    def cost(Fab, Fcd, I):
        return I * Fcd * NTcd + Fab * I * Fcd

    Fab, Fcd, I = nfab, nfcd, NTab
    if cost(Fab, Fcd, I) > C:
        Fcd = max(0, C // (NTab * (NTcd + nfab)))
        if Fcd == 0:
            Fcd = 1
            Fab = max(0, C // NTab - NTcd)
            if Fab == 0:
                Fab = 1
                I = max(1, C // (NTcd + 1))
    # shrink further while over the VMEM budget
    while _frag_live(tier, ls, Fab, Fcd, I, T) > _VMEM_BUDGET:
        if Fcd > 1:
            Fcd = (Fcd + 1) // 2
        elif Fab > 1:
            Fab = (Fab + 1) // 2
        elif I > 1:
            I = (I + 1) // 2
        else:
            return None
    nfr = (
        -(-nfab // Fab) * -(-nfcd // Fcd) * -(-NTab // I)
    )
    if nfr > _PALLAS_MAX_FRAGS:
        return None
    frags = []
    for a0 in range(0, nfab, Fab):
        for c0 in range(0, nfcd, Fcd):
            for i0 in range(0, NTab, I):
                frags.append(
                    (a0, min(a0 + Fab, nfab), c0, min(c0 + Fcd, nfcd),
                     i0, min(i0 + I, NTab))
                )
    return tuple(frags)


def pallas_supported(tier, ls, nprims, T) -> bool:
    """Static eligibility of the Pallas kernel for this class/batch."""
    if T % _LANE:
        return False
    return _fragment_plan(tier, ls, T) is not None


@lru_cache(maxsize=None)
def _kernel_fn(tier, ls, nprims, omega, T2, frag=None):
    """Build the traced kernel body for one (class, tier, chunk-shape,
    output fragment)."""
    ar = get_arith(tier)
    isdf = tier in ("df64", "fp64")
    npa, npb, npc, npd = nprims
    nq_bcd = npb * npc * npd
    nq_cd = npc * npd
    if frag is None:
        nfab, nfcd, NTab, _ = _class_dims(ls)
        frag = (0, nfab, 0, nfcd, 0, NTab)
    a0, a1, c0, c1, i0, i1 = frag
    nfg = (a1 - a0) * (c1 - c0)

    from jax.experimental import pallas as pl

    def kernel(*refs):
        if isdf:
            (a_hi, a_lo, b_hi, b_lo, c_hi, c_lo, d_hi, d_lo,
             out_hi, out_lo) = refs
        else:
            a_hi, b_hi, c_hi, d_hi, out_hi = refs
            a_lo = b_lo = c_lo = d_lo = out_lo = None

        q = pl.program_id(0)
        pa = q // nq_bcd
        rem = q - pa * nq_bcd
        pb = rem // nq_cd
        rem = rem - pb * nq_cd
        pc = rem // npd
        pd_ = rem - pc * npd

        def load(hi_ref, lo_ref, idx):
            if isdf:
                return df.DF64(hi_ref[idx], lo_ref[idx])
            return hi_ref[idx]

        def center(hi_ref, lo_ref, np_x, slot):
            coords = tuple(load(hi_ref, lo_ref, i) for i in range(3))
            e = load(hi_ref, lo_ref, 3 + slot)
            c = load(hi_ref, lo_ref, 3 + np_x + slot)
            return coords, e, c

        Ac, ea, ca = center(a_hi, a_lo, npa, pa)
        Bc, eb, cb = center(b_hi, b_lo, npb, pb)
        Cc, ec, cc = center(c_hi, c_lo, npc, pc)
        Dc, ed, cd = center(d_hi, d_lo, npd, pd_)

        pdata = make_pair_data_c(ar, Ac, Bc, ea, eb, ar.mul(ca, cb))
        qdata = make_pair_data_c(ar, Cc, Dc, ec, ed, ar.mul(cc, cd))
        rows, _, _ = eri_scalar_g_rows(
            ar, ls, pdata, qdata, omega,
            fab_sel=range(a0, a1), fcd_sel=range(c0, c1),
            itb_sel=range(i0, i1),
        )

        @pl.when(q == 0)
        def _():
            out_hi[...] = jnp.zeros((nfg, T2, _LANE), jnp.float32)
            if isdf:
                out_lo[...] = jnp.zeros((nfg, T2, _LANE), jnp.float32)

        for r, row in enumerate(rows):
            if row is None:
                continue
            if isdf:
                s = df.add(df.DF64(out_hi[r], out_lo[r]), row)
                out_hi[r] = s.hi
                out_lo[r] = s.lo
            else:
                out_hi[r] = out_hi[r] + row

    return kernel


def eri_chunk_pallas(tier, ls, nprims, quartet, omega: float = 0.0):
    """Drop-in Pallas version of ops/eri.py::contracted_eri_batch.

    quartet: dict with coord_X (T, 3), exps_X / coefs_X (T, npX) per
    center (ar-native).  Returns the (T, nfab, nfcd) ERI block batch.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ar = get_arith(tier)
    isdf = tier in ("df64", "fp64")
    npa, npb, npc, npd = nprims
    npq = npa * npb * npc * npd
    nfab = _nf(ls[0]) * _nf(ls[1])
    nfcd = _nf(ls[2]) * _nf(ls[3])
    T = ar.hi(quartet["exps_a"]).shape[0]
    T2 = T // _LANE

    def stack_center(name, np_x):
        """(T,3)+(T,np)x2 -> stacked (3+2np, T2, LANE) [hi(,lo)]."""
        coord = quartet[f"coord_{name}"]
        exps = quartet[f"exps_{name}"]
        coefs = quartet[f"coefs_{name}"]
        parts = [coord[:, i] for i in range(3)]
        parts += [exps[:, p] for p in range(np_x)]
        parts += [coefs[:, p] for p in range(np_x)]
        if isdf:
            hi = jnp.stack([p.hi for p in parts]).reshape(-1, T2, _LANE)
            lo = jnp.stack([p.lo for p in parts]).reshape(-1, T2, _LANE)
            return [hi, lo]
        return [jnp.stack(parts).reshape(-1, T2, _LANE)]

    inputs = []
    for name, np_x in zip("abcd", nprims):
        inputs += stack_center(name, np_x)

    def spec(k):
        return pl.BlockSpec(
            (k, T2, _LANE), lambda q: (0, 0, 0), memory_space=pltpu.VMEM
        )

    in_specs = []
    for np_x in nprims:
        k = 3 + 2 * np_x
        in_specs += [spec(k)] * (2 if isdf else 1)
    n_out = 2 if isdf else 1

    frags = _fragment_plan(tier, ls, T)
    assert frags is not None, (tier, ls, T)

    def run_frag(frag):
        a0, a1, c0, c1, _, _ = frag
        nfg = (a1 - a0) * (c1 - c0)
        kernel = _kernel_fn(tier, ls, nprims, float(omega or 0.0), T2, frag)
        out_shape = [
            jax.ShapeDtypeStruct((nfg, T2, _LANE), jnp.float32)
        ] * n_out
        return pl.pallas_call(
            kernel,
            grid=(npq,),
            in_specs=in_specs,
            out_specs=[spec(nfg)] * n_out,
            out_shape=out_shape,
            interpret=jax.default_backend() == "cpu",
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        )(*inputs)

    # one pallas_call per fragment INSIDE the traced scan body (device-
    # side ops: no host dispatch per fragment); itb partials sum (DF64:
    # compensated two-sum), then the (fab, fcd) block grid is stitched
    blocks = {}
    for frag in frags:
        a0, a1, c0, c1, _, _ = frag
        outs = run_frag(frag)
        cur = df.DF64(outs[0], outs[1]) if isdf else outs[0]
        key = (a0, c0)
        if key in blocks:
            blocks[key] = (
                df.add(blocks[key], cur) if isdf else blocks[key] + cur
            )
        else:
            blocks[key] = cur

    fab_starts = sorted({a0 for (a0, _) in blocks})
    fcd_starts = sorted({c0 for (_, c0) in blocks})
    fdims = {(f[0], f[2]): (f[1] - f[0], f[3] - f[2]) for f in frags}

    def assemble(pick):
        # blocks of (Fa*Fc, T2, LANE) -> (T, nfab, nfcd)
        fab_rows = []
        for a0 in fab_starts:
            row = []
            for c0 in fcd_starts:
                Fa, Fc = fdims[(a0, c0)]
                row.append(pick(blocks[(a0, c0)]).reshape(Fa, Fc, T))
            fab_rows.append(jnp.concatenate(row, axis=1) if len(row) > 1
                            else row[0])
        full = (jnp.concatenate(fab_rows, axis=0) if len(fab_rows) > 1
                else fab_rows[0])  # (nfab, nfcd, T)
        return jnp.moveaxis(full, -1, 0)

    if isdf:
        return df.DF64(assemble(lambda b: b.hi), assemble(lambda b: b.lo))
    return assemble(lambda b: b)


__all__ = ["eri_chunk_pallas", "pallas_supported"]
