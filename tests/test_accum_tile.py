"""Bilinear tile accumulation vs numpy-f64 dense oracle.

The kernel's contract (ops/accum_tile.py): exact deterministic dense
accumulation of per-task stream values into a (Wx, Wy, nf) supertile
block -- the scatter-free replacement for the per-element limb scatter
(reference contrast: atomicAdd, jk/1q1t.cu:423-643).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from joltqc_tpu.ops import df64 as df
from joltqc_tpu.ops.accum_tile import tile_accumulate, tile_limbs_to_df64


def _oracle(vals64, ix, iy, Wx, Wy):
    nf = vals64.shape[1]
    out = np.zeros((Wx, Wy, nf))
    for t in range(len(ix)):
        out[ix[t], iy[t]] += vals64[t]
    return out


@pytest.mark.parametrize("tier,nf,Wx,Wy", [
    ("f32", 3, 64, 64),
    ("f32", 9, 64, 64),
    ("df64", 3, 64, 64),
    ("df64", 36, 64, 64),
    ("f32", 1, 8, 64),
])
def test_tile_accumulate_matches_dense_oracle(tier, nf, Wx, Wy):
    rng = np.random.default_rng(7)
    T = 1024
    vals64 = rng.standard_normal((T, nf)) * np.exp(
        rng.uniform(-12, 0, (T, 1))
    )
    ix = rng.integers(0, Wx, T).astype(np.int32)
    iy = rng.integers(0, Wy, T).astype(np.int32)
    bound = jnp.float32(np.abs(vals64).max() * 1.5)

    if tier == "df64":
        vals = df.from_f64(vals64)
    else:
        vals = jnp.asarray(vals64.astype(np.float32))
        vals64 = np.asarray(vals, np.float64)  # oracle on the rounded f32

    fn = jax.jit(
        lambda v, i, j: tile_accumulate(v, i, j, Wx, Wy, bound)
    )
    limbs, sexp = fn(vals, jnp.asarray(ix), jnp.asarray(iy))
    got = np.asarray(
        df.to_f64(tile_limbs_to_df64(limbs.astype(jnp.int32), sexp))
    )
    want = _oracle(vals64, ix, iy, Wx, Wy)
    tol = 1e-15 * np.abs(vals64).max() if tier == "df64" else 1e-13
    np.testing.assert_allclose(got, want, atol=tol * max(T, 1))


def test_tile_accumulate_cross_chunk_int32_carry():
    """Two chunks accumulated via the int32 carry match one dense pass."""
    rng = np.random.default_rng(3)
    T, nf, W = 512, 3, 64
    vals64 = rng.standard_normal((2, T, nf))
    ix = rng.integers(0, W, (2, T)).astype(np.int32)
    iy = rng.integers(0, W, (2, T)).astype(np.int32)
    bound = jnp.float32(3.0)

    def run(v, i, j, carry):
        limbs, sexp = tile_accumulate(v, i, j, W, W, bound)
        return carry + limbs.astype(jnp.int32), sexp

    carry = jnp.zeros((W, W, nf, 10), jnp.int32)
    for c in range(2):
        carry, sexp = jax.jit(run)(
            df.from_f64(vals64[c]), jnp.asarray(ix[c]), jnp.asarray(iy[c]),
            carry,
        )
    got = np.asarray(df.to_f64(tile_limbs_to_df64(carry, sexp)))
    want = _oracle(vals64.reshape(-1, nf), ix.reshape(-1), iy.reshape(-1),
                   W, W)
    np.testing.assert_allclose(got, want, atol=1e-12)


@pytest.mark.parametrize("tier,nfxy,nfo", [
    ("f32", 3, 3),
    ("f32", 9, 9),
    ("df64", 3, 1),
    ("df64", 9, 4),
    ("f32", 1, 1),
])
def test_fused_contract_tile_matches_oracle(tier, nfxy, nfo):
    """contract-with-dm-rows + bilinear accumulate vs numpy."""
    from joltqc_tpu.ops.accum_tile import dm_rows_t, fused_contract_tile

    rng = np.random.default_rng(5)
    T, Wx, Wy = 1024, 64, 64
    G64 = rng.standard_normal((T, nfxy, nfo)) * np.exp(
        rng.uniform(-8, 0, (T, 1, 1))
    )
    drow64 = rng.standard_normal((T, nfo))
    lx = rng.integers(0, Wx, T).astype(np.int32)
    ly = rng.integers(0, Wy, T).astype(np.int32)
    bound = jnp.float32(np.abs(G64).max() * np.abs(drow64).max() * nfo * 2)

    if tier == "df64":
        G = df.from_f64(G64)
        drow = df.from_f64(drow64)
    else:
        G = jnp.asarray(G64.astype(np.float32))
        G64 = np.asarray(G, np.float64)
        drow = jnp.asarray(drow64.astype(np.float32))
        drow64 = np.asarray(drow, np.float64)

    dt = dm_rows_t(drow, nfo)
    fn = jax.jit(
        lambda g, d, a, b: fused_contract_tile(g, d, a, b, Wx, Wy, bound)
    )
    limbs, sexp = fn(G, dt, jnp.asarray(lx), jnp.asarray(ly))
    got = np.asarray(
        df.to_f64(tile_limbs_to_df64(limbs.astype(jnp.int32), sexp))
    )

    vals = np.einsum("tao,to->ta", G64, drow64)
    want = np.zeros((Wx, Wy, nfxy))
    np.add.at(want, (lx, ly), vals)
    # the in-kernel contraction rounds per f32 op like the scatter path;
    # tolerance scales with the contraction length
    scale = np.abs(G64).max() * np.abs(drow64).max() * nfo * T
    tol = (1e-14 if tier == "df64" else 2e-7) * scale
    np.testing.assert_allclose(got, want, atol=tol)


def test_tile_accumulate_determinism():
    """Task order must not change a single bit (integer adds)."""
    rng = np.random.default_rng(11)
    T, nf, W = 512, 4, 64
    vals64 = rng.standard_normal((T, nf)) * np.exp(
        rng.uniform(-20, 0, (T, 1))
    )
    ix = rng.integers(0, W, T).astype(np.int32)
    iy = rng.integers(0, W, T).astype(np.int32)
    bound = jnp.float32(1.5)
    perm = rng.permutation(T)

    fn = jax.jit(lambda v, i, j: tile_accumulate(v, i, j, W, W, bound))
    a, _ = fn(df.from_f64(vals64), jnp.asarray(ix), jnp.asarray(iy))
    b, _ = fn(df.from_f64(vals64[perm]), jnp.asarray(ix[perm]),
              jnp.asarray(iy[perm]))
    assert np.array_equal(np.asarray(a), np.asarray(b))
