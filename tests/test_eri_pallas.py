"""Pallas ERI class kernel vs the XLA scalarized path (interpret mode).

The Pallas kernel (ops/eri_pallas.py) shares the scalar MD assembly with
the XLA path (ops/md.py::eri_scalar_g_rows), so this test pins down the
kernel *plumbing*: slot selection from the grid index, the stacked
per-center input layout, VMEM accumulation over primitive quartets, and
the DF64 hi/lo ref pairing.  On CPU the pallas_call runs in interpreter
mode; the real-chip path is exercised by bench.py / JQC_TEST_TPU runs.
"""

import numpy as np
import pytest

from joltqc_tpu.ops import df64 as df
from joltqc_tpu.ops.eri import contracted_eri_batch
from joltqc_tpu.ops.eri_pallas import eri_chunk_pallas, pallas_supported


def _quartet(tier, nprims, T, seed=0):
    rng = np.random.default_rng(seed)
    isdf = tier == "df64"
    geom = {}
    for name, np_x in zip("abcd", nprims):
        coord = rng.standard_normal((T, 3))
        exps = rng.uniform(0.3, 3.0, (T, np_x))
        coefs = rng.standard_normal((T, np_x))
        if isdf:
            geom[f"coord_{name}"] = df.from_f64(coord)
            geom[f"exps_{name}"] = df.from_f64(exps)
            geom[f"coefs_{name}"] = df.from_f64(coefs)
        else:
            geom[f"coord_{name}"] = np.asarray(coord, np.float32)
            geom[f"exps_{name}"] = np.asarray(exps, np.float32)
            geom[f"coefs_{name}"] = np.asarray(coefs, np.float32)
    return geom


CASES = [
    ((0, 0, 0, 0), (2, 2, 2, 2)),
    ((1, 0, 1, 0), (2, 1, 2, 1)),
    ((1, 1, 1, 1), (1, 1, 1, 1)),
    ((2, 1, 1, 0), (1, 1, 1, 1)),
]


@pytest.mark.parametrize("ls,nprims", CASES)
@pytest.mark.parametrize("tier", ["f32", "df64"])
def test_pallas_matches_xla(ls, nprims, tier):
    T = 128
    assert pallas_supported(tier, ls, nprims, T)
    geom = _quartet(tier, nprims, T, seed=sum(ls) + sum(nprims))
    ref = contracted_eri_batch(tier, ls, nprims, geom, 0.0)
    out = eri_chunk_pallas(tier, ls, nprims, geom, 0.0)
    if tier == "df64":
        ref = np.asarray(df.to_f64(ref))
        out = np.asarray(df.to_f64(out))
        tol = 1e-12
    else:
        ref = np.asarray(ref, np.float64)
        out = np.asarray(out, np.float64)
        tol = 2e-5
    scale = np.abs(ref).max() + 1e-30
    assert np.abs(out - ref).max() / scale < tol


def test_pallas_omega():
    ls, nprims, T = (1, 0, 1, 0), (2, 1, 2, 1), 128
    geom = _quartet("f32", nprims, T, seed=7)
    ref = np.asarray(contracted_eri_batch("f32", ls, nprims, geom, 0.33))
    out = np.asarray(eri_chunk_pallas("f32", ls, nprims, geom, 0.33))
    scale = np.abs(ref).max() + 1e-30
    assert np.abs(out - ref).max() / scale < 2e-5


def test_pallas_unsupported_shapes():
    # unaligned T and very high-l classes fall back to the XLA path
    assert not pallas_supported("f32", (1, 0, 1, 0), (1, 1, 1, 1), 96)
    assert not pallas_supported("f32", (4, 4, 4, 4), (1, 1, 1, 1), 128)


FRAG_CASES = [
    # (cap, tier, ls, nprims): caps force fcd / fab+fcd / itb fragment
    # decompositions on classes small enough for interpret mode
    (300, "df64", (1, 1, 1, 1), (2, 1, 1, 1)),
    (150, "f32", (1, 1, 1, 1), (1, 1, 1, 1)),
    (40, "f32", (2, 2, 0, 0), (1, 1, 1, 1)),
]


@pytest.mark.parametrize("cap,tier,ls,nprims", FRAG_CASES)
def test_fragmented_pallas_matches_xla(cap, tier, ls, nprims, monkeypatch):
    """Output-fragment decomposition (the 1qnt analogue, VERDICT r2 item
    3): force small program caps so fcd / fab / itb splits all engage,
    and check bit-level agreement with the XLA scalar path.  On the real
    chip the default cap (20000) fragments d/f classes; (2,2,2,2) df64
    measured 3.0x over the XLA path (see CLAUDE.md perf table)."""
    import joltqc_tpu.ops.eri_pallas as ep

    monkeypatch.setattr(ep, "_PALLAS_ASM_MAX", cap)
    monkeypatch.setattr(ep, "_PALLAS_MAX_FRAGS", 200)
    ep._fragment_plan.cache_clear()
    try:
        frags = ep._fragment_plan(tier, ls, 128)
        assert frags is not None and len(frags) > 1
        T = 128
        geom = _quartet(tier, nprims, T, seed=11)
        ref = contracted_eri_batch(tier, ls, nprims, geom, 0.0)
        out = eri_chunk_pallas(tier, ls, nprims, geom, 0.0)
        if tier == "df64":
            ref = np.asarray(df.to_f64(ref))
            out = np.asarray(df.to_f64(out))
            tol = 1e-12
        else:
            ref = np.asarray(ref, np.float64)
            out = np.asarray(out, np.float64)
            tol = 2e-5
        scale = np.abs(ref).max() + 1e-30
        assert np.abs(out - ref).max() / scale < tol
    finally:
        ep._fragment_plan.cache_clear()


def test_fragment_plan_structure():
    """Plans partition the (fab, fcd, itb) space exactly."""
    from joltqc_tpu.ops.eri_pallas import _class_dims, _fragment_plan

    for tier, ls in [("df64", (2, 2, 2, 2)), ("f32", (2, 2, 2, 1))]:
        frags = _fragment_plan(tier, ls, 1024)
        assert frags is not None
        nfab, nfcd, NTab, _ = _class_dims(ls)
        cells = set()
        for a0, a1, c0, c1, i0, i1 in frags:
            for a in range(a0, a1):
                for c in range(c0, c1):
                    for i in range(i0, i1):
                        assert (a, c, i) not in cells
                        cells.add((a, c, i))
        assert len(cells) == nfab * nfcd * NTab
