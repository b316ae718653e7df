"""DF64 double-float arithmetic accuracy tests (oracle: numpy float64).

These bounds define the 'FP64 tier' spec for all TPU kernels: ~1.5e-14
relative error per op (48-bit effective mantissa), mirroring the FP64
tolerances asserted by the reference tests
(/root/reference/jqc/pyscf/tests/test_jk.py:83-84).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from joltqc_tpu.ops import df64 as df

RTOL = 2e-13  # a few DF64 ulps


def _rand(n=4096, lo=-1e3, hi=1e3, seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(lo, hi, n)


def test_roundtrip():
    x = _rand()
    d = df.from_f64(x)
    # split residual can reach ~2^-48 relative (the DF64 representation limit)
    np.testing.assert_allclose(df.to_f64(d), x, rtol=8e-15)


@pytest.mark.parametrize("op,npop", [
    (df.add, np.add), (df.sub, np.subtract), (df.mul, np.multiply), (df.div, np.divide),
])
def test_binary_ops(op, npop):
    a64 = _rand(seed=1)
    b64 = _rand(seed=2)
    b64[np.abs(b64) < 1e-3] = 1.0  # avoid huge quotients
    da, db = df.from_f64(a64), df.from_f64(b64)
    # oracle must use the DF64-rounded inputs: for a ~= -b the representation
    # error of the inputs dominates (cancellation), which is not the op's fault
    ar, br = df.to_f64(da), df.to_f64(db)
    out = jax.jit(lambda a, b: op(a, b))(da, db)
    ref = npop(ar, br)
    np.testing.assert_allclose(df.to_f64(out), ref, rtol=RTOL, atol=1e-290)


def test_sqrt():
    a64 = np.abs(_rand(seed=3)) + 1e-6
    out = jax.jit(df.sqrt)(df.from_f64(a64))
    np.testing.assert_allclose(df.to_f64(out), np.sqrt(a64), rtol=RTOL)


def test_exp():
    # chemistry-relevant exponent range (gaussians: exp(-e*r^2)); full DF64
    # precision holds while the result's lo limb stays normal (|y| > ~2e-31)
    a64 = _rand(lo=-60, hi=20, seed=4)
    da = df.from_f64(a64)
    out = jax.jit(df.exp)(da)
    assert np.max(np.abs(df.to_f64(out) / np.exp(df.to_f64(da)) - 1.0)) < 5e-13


def test_exp_tiny_tail_f32_grade():
    # below ~2e-31 the lo limb flushes; still f32-accurate until the hi limb
    # itself underflows around exp(-87)
    a64 = _rand(lo=-85, hi=-60, seed=44)
    out = df.exp(df.from_f64(a64))
    assert np.max(np.abs(df.to_f64(out) / np.exp(a64) - 1.0)) < 1e-6


def test_exp_underflow_is_zero():
    out = df.exp(df.from_f64(np.array([-500.0, -200.0])))
    assert np.all(df.to_f64(out) == 0.0)


def test_log():
    a64 = np.abs(_rand(seed=5)) + 1e-3
    out = jax.jit(df.log)(df.from_f64(a64))
    np.testing.assert_allclose(df.to_f64(out), np.log(a64), rtol=RTOL, atol=1e-13)


def test_powi():
    a64 = _rand(lo=-3, hi=3, seed=6)
    out = jax.jit(lambda a: df.powi(a, 7))(df.from_f64(a64))
    np.testing.assert_allclose(df.to_f64(out), a64 ** 7, rtol=RTOL, atol=1e-12)


def test_dfsum_compensated():
    # 1e5 terms of alternating magnitudes: naive f32 sum fails badly here
    rng = np.random.default_rng(7)
    x = rng.uniform(-1, 1, 100_000) * np.exp(rng.uniform(0, 10, 100_000))
    out = jax.jit(df.dfsum)(df.from_f64(x))
    ref = np.sum(x)
    assert abs(df.to_f64(out) - ref) / abs(ref) < 1e-11


def test_two_prod_exact():
    # exactness of the Dekker product: p + err must equal the f64 product
    rng = np.random.default_rng(8)
    a = rng.uniform(-1e5, 1e5, 1000).astype(np.float32)
    b = rng.uniform(-1e5, 1e5, 1000).astype(np.float32)
    p, e = jax.jit(df.two_prod)(jnp.asarray(a), jnp.asarray(b))
    ref = a.astype(np.float64) * b.astype(np.float64)
    got = np.asarray(p, np.float64) + np.asarray(e, np.float64)
    np.testing.assert_array_equal(got, ref)
