"""Boys function accuracy vs scipy (incomplete-gamma closed form).

Accuracy tiers mirror the reference's precision scheme: the DF64 tier
must support FP64-grade ERIs (<1e-7 absolute error in vj/vk per
/root/reference/jqc/pyscf/tests/test_jk.py:83), which requires Boys
values good to ~1e-13 relative; the f32 tier mirrors the 1e-3 FP32 tier.
"""

import numpy as np
import jax
from scipy import special

from joltqc_tpu.ops import df64 as df
from joltqc_tpu.ops.boys import boys_df64, boys_f32

MMAX = 18


def boys_ref(m, x):
    x = np.asarray(x, np.float64)
    tiny = x < 1e-13
    xs = np.where(tiny, 1.0, x)
    a = m + 0.5
    val = special.gamma(a) * special.gammainc(a, xs) / (2 * xs**a)
    return np.where(tiny, 1.0 / (2 * m + 1), val)


def _grid():
    # dense near the series/asymptotic switch + wide log range
    return np.concatenate([
        np.array([0.0, 1e-10, 1e-6]),
        np.logspace(-4, 2.3, 400),
        np.linspace(30, 40, 101),  # the switch region
    ])


def test_boys_df64():
    x = _grid()
    fs = jax.jit(lambda d: boys_df64(MMAX, d))(df.from_f64(x))
    for m in range(MMAX + 1):
        got = df.to_f64(fs[m])
        ref = boys_ref(m, x)
        rel = np.abs(got - ref) / ref
        assert rel.max() < 5e-13, (m, x[np.argmax(rel)], rel.max())


def test_boys_df64_small_mmax_switches():
    # the series/erfc-CF switch point depends on mmax (max(12, 2m+5));
    # cover the low-L switches the hot ERI classes actually use,
    # with extra density around each switch region
    x = np.concatenate([_grid(), np.linspace(8, 30, 221)])
    for mmax in (0, 2, 4, 8):
        fs = jax.jit(lambda d, m=mmax: boys_df64(m, d))(df.from_f64(x))
        for m in range(mmax + 1):
            got = df.to_f64(fs[m])
            ref = boys_ref(m, x)
            rel = np.abs(got - ref) / ref
            assert rel.max() < 5e-13, (mmax, m, x[np.argmax(rel)], rel.max())


def test_boys_f32():
    x = _grid()
    fs = np.asarray(jax.jit(lambda d: boys_f32(MMAX, d))(x.astype(np.float32)))
    for m in range(MMAX + 1):
        ref = boys_ref(m, x)
        rel = np.abs(fs[m] - ref) / ref
        assert rel.max() < 2e-5, (m, x[np.argmax(rel)], rel.max())


def test_boys_downward_consistency():
    # identity: F_{m+1} = ((2m+1) F_m - e^{-x}) / (2x)
    x = np.logspace(-2, 1.8, 50)
    fs = boys_df64(6, df.from_f64(x))
    f = [df.to_f64(v) for v in fs]
    for m in range(6):
        lhs = f[m + 1]
        rhs = ((2 * m + 1) * f[m] - np.exp(-x)) / (2 * x)
        np.testing.assert_allclose(lhs, rhs, rtol=2e-11)
