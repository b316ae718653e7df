"""Deterministic fixed-point scatter accumulator tests.

This is the TPU replacement for CUDA atomicAdd; determinism here is what
lets the framework claim 'race-free by construction' (SURVEY.md section 5
notes the reference validates atomics only statistically)."""

import numpy as np
import jax
import jax.numpy as jnp

from joltqc_tpu.ops import df64 as df
from joltqc_tpu.ops.accum import scatter_add_det


def test_accuracy_vs_f64():
    rng = np.random.default_rng(0)
    n, size = 200_000, 64
    vals = rng.uniform(-1, 1, n) * 10.0 ** rng.uniform(-8, 2, n)
    idx = rng.integers(0, size, n)
    out = jax.jit(lambda v, i: scatter_add_det(v, i, size))(
        df.from_f64(vals), jnp.asarray(idx, jnp.int32)
    )
    ref = np.zeros(size)
    np.add.at(ref, idx, vals)
    err = np.abs(df.to_f64(out) - ref)
    # 64 bits below max magnitude ~ 100 -> absolute floor ~ 1e-17·sqrt(n)
    assert err.max() < 1e-10, err.max()


def test_determinism_under_permutation():
    rng = np.random.default_rng(1)
    n, size = 50_000, 16
    vals = rng.uniform(-1, 1, n)
    idx = rng.integers(0, size, n)
    perm = rng.permutation(n)
    f = jax.jit(lambda v, i: scatter_add_det(v, i, size))
    a = df.to_f64(f(df.from_f64(vals), jnp.asarray(idx, jnp.int32)))
    b = df.to_f64(f(df.from_f64(vals[perm]), jnp.asarray(idx[perm], jnp.int32)))
    np.testing.assert_array_equal(a, b)


def test_padding_dropped():
    vals = np.array([1.0, 2.0, 99.0])
    idx = np.array([0, 1, 4], np.int32)  # 4 == size -> dropped
    out = df.to_f64(scatter_add_det(df.from_f64(vals), jnp.asarray(idx), 4))
    np.testing.assert_allclose(out, [1.0, 2.0, 0, 0], atol=1e-12)


def test_f32_input_tier():
    rng = np.random.default_rng(2)
    vals = rng.uniform(-1, 1, 10_000).astype(np.float32)
    idx = rng.integers(0, 8, 10_000).astype(np.int32)
    out = df.to_f64(scatter_add_det(jnp.asarray(vals), jnp.asarray(idx), 8))
    ref = np.zeros(8)
    np.add.at(ref, idx, vals.astype(np.float64))
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_block_accumulate_exact():
    import numpy as np
    from joltqc_tpu.ops import df64 as df
    from joltqc_tpu.ops.accum import block_accumulate

    rng = np.random.default_rng(3)
    T, nf, nrows = 1024, 5, 16
    vals = rng.standard_normal((T, nf)) * np.exp(rng.uniform(-20, 3, (T, nf)))
    keys = rng.integers(0, nrows + 2, T).astype(np.int32)  # incl. pad rows
    out = block_accumulate(
        df.from_f64(vals), keys, nrows, np.float32(np.abs(vals).max() * 2)
    )
    got = np.asarray(df.to_f64(out))
    ref = np.zeros((nrows, nf))
    for t in range(T):
        if keys[t] < nrows:
            ref[keys[t]] += vals[t]
    scale = np.abs(vals).max()
    assert np.abs(got - ref).max() < 1e-13 * scale
    # f32 input path
    out32 = block_accumulate(
        np.asarray(vals, np.float32), keys, nrows,
        np.float32(np.abs(vals).max() * 2),
    )
    got32 = np.asarray(df.to_f64(out32))
    ref32 = np.zeros((nrows, nf))
    for t in range(T):
        if keys[t] < nrows:
            ref32[keys[t]] += np.float64(np.float32(vals[t].astype(np.float32)))
    assert np.abs(got32 - ref32).max() < 1e-9 * scale


def test_block_accumulate_pallas_matches_xla():
    import numpy as np
    from joltqc_tpu.ops import df64 as df
    from joltqc_tpu.ops.accum import block_accumulate
    from joltqc_tpu.ops.accum_pallas import block_accumulate_pallas

    rng = np.random.default_rng(9)
    T, nf, nrows = 256, 3, 32
    vals = rng.standard_normal((T, nf)) * np.exp(rng.uniform(-15, 2, (T, nf)))
    keys = rng.integers(0, nrows + 3, T).astype(np.int32)
    mx = np.float32(np.abs(vals).max() * 2)
    ref = np.asarray(df.to_f64(block_accumulate(df.from_f64(vals), keys, nrows, mx)))
    got = np.asarray(
        df.to_f64(block_accumulate_pallas(df.from_f64(vals), keys, nrows, mx))
    )
    assert np.abs(got - ref).max() < 1e-13 * np.abs(vals).max()
    # f32 input path
    ref32 = np.asarray(
        df.to_f64(block_accumulate(np.asarray(vals, np.float32), keys, nrows, mx))
    )
    got32 = np.asarray(
        df.to_f64(
            block_accumulate_pallas(np.asarray(vals, np.float32), keys, nrows, mx)
        )
    )
    assert np.abs(got32 - ref32).max() < 1e-9 * np.abs(vals).max()
