"""Boys function F_m(x) = ∫₀¹ t^{2m} exp(-x t²) dt, vectorized for TPU.

This replaces the Rys-quadrature root/weight machinery of the reference
backend (/root/reference/jqc/backend/rys/, ~2.4 kLoC of Chebyshev tables):
our ERI engine uses McMurchie-Davidson recurrences, which need only the
Boys function -- a better fit for a vector machine since every recurrence
step is a fused elementwise op over a batch of shell quartets.

Two precision tiers:
 - ``boys_df64``: DF64 (float32-pair) evaluation, ~1e-14 relative, for the
   FP64 task tier.
 - ``boys_f32``: plain float32, ~1e-6, for the FP32 task tier.

Algorithm (both tiers):
 - x <= switch: Kummer series at m_max,
      F_m(x) = e^{-x} * sum_{i>=0} (2x)^i / ((2m+1)(2m+3)...(2m+2i+1)),
   followed by stable downward recursion
      F_{m-1}(x) = (2x F_m(x) + e^{-x}) / (2m-1).
 - x > switch: F_0(x) = sqrt(pi/(4x)) erf(sqrt x), with erf evaluated in
   DF64 through the Laplace continued fraction for erfc,
      erfc(t) = e^{-t^2}/sqrt(pi) / (t + (1/2)/(t + 1/(t + (3/2)/(...)))),
   and upward recursion F_{m+1} = ((2m+1) F_m - e^{-x}) / (2x).  The
   e^{-x} term is KEPT: for larger m, F_m(x) decays toward e^{-x} scale
   and dropping it costs ~1e-9 relative near the switch.  The switch
   point is max(12, 2*mmax + 5): the mmax term keeps the upward
   subtraction cancellation-free; the DF64-erfc branch frees the switch
   from erf saturation (x > 35), so the series -- the dominant op count
   of the whole DF64 ERI chain -- shrinks from ~160 to ~55 terms for the
   low-L classes that carry most primitive-quartet work.
"""

from __future__ import annotations

import math

import numpy as np

import jax
import jax.numpy as jnp

from . import df64 as df

_X_SWITCH = 35.0
_SQRT_PI_OVER_2 = math.sqrt(math.pi) / 2.0


def _switch_point(mmax: int) -> float:
    return max(12.0, 2.0 * mmax + 5.0)


# continued-fraction depth for the DF64 erfc branch (validated in
# tests/test_boys.py to 5e-13 relative down to the x = 12 switch)
_ERFC_CF_LEVELS = 24


def boys_df64(mmax: int, x: df.DF64, nseries: int | None = None):
    """Return list of DF64 arrays [F_0(x), ..., F_mmax(x)] (DF64 tier).

    ``x`` may have any shape; must be >= 0.
    """
    switch = _switch_point(mmax)
    if nseries is None:
        # tail of the series behaves like (2x/(2x+2i))^i; this bound gives
        # < 1e-16 truncation at x = switch
        nseries = int(2 * switch) + 30
    xs = df.where(x.hi <= switch, x, df.const(switch, x.hi.shape))
    emx = df.exp(df.neg(xs))  # e^{-x} for the series branch (clamped)
    two_x = df.scale_pow2(xs, 2.0)

    # --- series branch at m = mmax ---
    # t_0 = 1/(2m+1); t_{i+1} = t_i * 2x / (2m+2i+3); F = e^{-x} * sum t_i
    # 1/denom is done as a proper DF64 division: an f32-only reciprocal
    # would poison the whole product chain.
    # On TPU the series is FULLY unrolled (python loop, no lax.fori_loop):
    # on the v5e backend every while-loop iteration carries a large fixed
    # cost (~0.1-1 ms), which dwarfs the series arithmetic; the unrolled
    # chain fuses into the surrounding kernel instead.  Division by the
    # constant denominator becomes multiplication by its DF64-rounded
    # reciprocal (exact to 2^-48 relative -- beyond the tier target).
    # On CPU (the unit-test platform) the ~100-step unrolled chain
    # multiplies XLA compile time by ~50x across the many class kernels,
    # so there the rolled fori_loop is kept -- runtime per iteration is
    # tiny on CPU and compile time is the binding constraint.
    t0 = df.const(1.0 / (2 * mmax + 1), x.hi.shape)
    if jax.default_backend() == "cpu":
        def body(i, carry):
            t, s = carry
            denom = jnp.float32(2 * mmax + 3) + 2.0 * i.astype(jnp.float32)
            t = df.mul(t, two_x)
            t = df.div(t, df.DF64(denom, jnp.zeros_like(denom)))
            s = df.add(s, t)
            return (t, s)

        _, s = jax.lax.fori_loop(0, nseries, body, (t0, t0))
    else:
        t = s = t0
        for i in range(nseries):
            denom = 2 * mmax + 3 + 2 * i
            rhi = np.float32(1.0 / denom)
            rlo = np.float32(1.0 / denom - float(rhi))
            t = df.mul(df.mul(t, two_x), df.DF64(
                jnp.full_like(x.hi, rhi), jnp.full_like(x.hi, rlo)))
            s = df.add(s, t)
    f_mmax_small = df.mul(emx, s)

    # --- downward recursion for the series branch ---
    # 1/(2m-1) as a DF64-rounded constant (2^-48 relative) is cheaper than
    # a full division and accurate enough.
    fs_small = [None] * (mmax + 1)
    fs_small[mmax] = f_mmax_small
    for m in range(mmax, 0, -1):
        num = df.add(df.mul(two_x, fs_small[m]), emx)
        fs_small[m - 1] = df.mul(num, df.const(1.0 / (2 * m - 1), x.hi.shape))

    # --- large branch: F_0 = sqrt(pi/4x) erf(sqrt x), upward with e^{-x} ---
    xl = df.where(x.hi > switch, x, df.const(switch, x.hi.shape))
    emx_l = df.exp(df.neg(xl))  # tiny but kept: matters for F_m at larger m
    inv_x = df.recip(xl)
    # erf(sqrt x) = 1 - e^{-x}/sqrt(pi) * CF(sqrt x); no cancellation
    # (the subtracted term is <= erfc(sqrt 12) ~ 1e-6)
    t = df.sqrt(xl)
    cf = df.const(0.0, x.hi.shape)
    for k in range(_ERFC_CF_LEVELS, 0, -1):
        cf = df.div(df.const(0.5 * k, x.hi.shape), df.add(t, cf))
    kval = df.recip(df.add(t, cf))
    erf = df.sub(
        df.const(1.0, x.hi.shape),
        df.mul(df.mul(emx_l, kval), df.const(1.0 / math.sqrt(math.pi), x.hi.shape)),
    )
    f0_large = df.mul(
        df.mul(df.const(_SQRT_PI_OVER_2, x.hi.shape), df.sqrt(inv_x)), erf
    )
    inv_2x = df.scale_pow2(inv_x, 0.5)
    fs_large = [None] * (mmax + 1)
    fs_large[0] = f0_large
    for m in range(mmax):
        num = df.sub(df.mul_f32(fs_large[m], float(2 * m + 1)), emx_l)
        fs_large[m + 1] = df.mul(num, inv_2x)

    use_small = x.hi <= switch
    return [df.where(use_small, fs_small[m], fs_large[m]) for m in range(mmax + 1)]


def boys_f32(mmax: int, x, nseries: int | None = None):
    """Return stacked f32 array F[m, ...] for m=0..mmax (FP32 tier).

    The large-x branch uses the EXACT closed form
    F_0 = sqrt(pi/4x) erf(sqrt x) (erf is a cheap native op in f32), so
    the switch point only needs upward-recursion stability (x >~ m),
    not erf saturation -- this halves the series length vs the DF64
    tier's switch, a large win since the ERI path is op-bound."""
    switch = max(10.0, 2.0 * mmax + 3.0)
    if nseries is None:
        # f32 target ~1e-7 relative: tail < 1e-8 at x = switch
        nseries = int(2 * switch) + 30
    x = jnp.asarray(x, jnp.float32)
    xs = jnp.minimum(x, switch)
    emx = jnp.exp(-xs)
    two_x = 2.0 * xs

    # unrolled on TPU, rolled on CPU (see boys_df64: TPU while-loop
    # iterations are the dominant runtime cost; CPU pays in compile time)
    t0 = jnp.full_like(x, 1.0 / (2 * mmax + 1))
    if jax.default_backend() == "cpu":
        def body(i, carry):
            t, s = carry
            denom = jnp.float32(2 * mmax + 3) + 2.0 * i.astype(jnp.float32)
            t = t * two_x / denom
            return (t, s + t)

        _, s = jax.lax.fori_loop(0, nseries, body, (t0, t0))
    else:
        t = s = t0
        for i in range(nseries):
            t = t * two_x * np.float32(1.0 / (2 * mmax + 3 + 2 * i))
            s = s + t
    f_mmax = emx * s

    fs_small = [None] * (mmax + 1)
    fs_small[mmax] = f_mmax
    for m in range(mmax, 0, -1):
        fs_small[m - 1] = (two_x * fs_small[m] + emx) / (2 * m - 1)

    xl = jnp.maximum(x, switch)
    emx_l = jnp.exp(-xl)
    # erf(sqrt x) for x >= 10 via the asymptotic erfc expansion
    #   erfc(t) = e^{-t^2}/(t sqrt(pi)) (1 - u + 3u^2 - 15u^3),  u = 1/(2x)
    # |err| < 5e-9 at x = 10 (f32 target 1e-7).  Composed of primitive
    # ops only: lax.erf has no Pallas TPU lowering, and this is cheaper.
    inv_sqrt_xl = jax.lax.rsqrt(xl)
    u = 0.5 / xl
    poly = 1.0 + u * (-1.0 + u * (3.0 - 15.0 * u))
    erf_l = 1.0 - emx_l * inv_sqrt_xl * np.float32(1.0 / np.sqrt(np.pi)) * poly
    f0_large = _SQRT_PI_OVER_2 * inv_sqrt_xl * erf_l
    inv_2x = 0.5 / xl
    fs_large = [None] * (mmax + 1)
    fs_large[0] = f0_large
    for m in range(mmax):
        fs_large[m + 1] = ((2 * m + 1) * fs_large[m] - emx_l) * inv_2x

    use_small = x <= switch
    return jnp.stack([jnp.where(use_small, fs_small[m], fs_large[m]) for m in range(mmax + 1)])


__all__ = ["boys_df64", "boys_f32"]
