"""Scaled modified spherical Bessel functions for ECP integrals.

i~_l(x) = exp(-x) * i_l(x), the exponentially-scaled modified spherical
Bessel function of the first kind -- the radial kernel of ECP integrals
(reference counterpart: `_ine` in /root/reference/jqc/backend/ecp/bessel.cu).

Two regimes (both DF64):
 - x <= 40: Taylor series of i_l times df.exp(-x); terms reach ~e^40
   (~2e17), comfortably inside f32 range, and DF64 keeps 14 digits.
 - x > 40: the exact closed form
       i~_l(x) = 1/(2x) [ sum_k (-)^k c_k (2x)^-k
                          + (-)^{l+1} e^{-2x} sum_k c_k (2x)^-k ],
   c_k = (l+k)!/(k! (l-k)!), whose alternating sum loses at most ~1
   digit for l <= 9 at the switch point.
"""

from __future__ import annotations

from functools import lru_cache
from math import factorial

import numpy as np
import jax
import jax.numpy as jnp

from . import df64 as df
from .df64 import DF64

_X_SWITCH = 40.0
_NSERIES = 130  # series terms: peak index ~ x, converged at x=40 by k~120


def _dfact(n: int) -> float:
    out = 1.0
    while n > 1:
        out *= n
        n -= 2
    return out


@lru_cache(maxsize=None)
def _series_coefs(l: int, nterms: int):
    # i_l(x) = x^l sum_k a_k x^{2k},  a_k = 1 / (2^k k! (2l+2k+1)!!)
    a = np.zeros(nterms)
    for k in range(nterms):
        a[k] = 1.0 / (2.0**k * factorial(k) * _dfact(2 * l + 2 * k + 1))
    return a


@lru_cache(maxsize=None)
def _asym_coefs(l: int):
    return np.array(
        [factorial(l + k) / (factorial(k) * factorial(l - k)) for k in range(l + 1)]
    )


def ine_df64(lmax: int, x: DF64):
    """[i~_0(x), ..., i~_lmax(x)] as DF64 arrays; x >= 0 any shape.

    All orders share one series loop (coefficient table per l) and one
    asymptotic branch -- vectorized over x, loop count independent of
    shape.
    """
    xs = df.where(x.hi <= _X_SWITCH, x, df.const(_X_SWITCH, x.hi.shape))
    x2 = df.mul(xs, xs)
    emx = df.exp(df.neg(xs))

    # --- series branch, term-recurrence form (coefficients of the plain
    # Taylor sum underflow f32 beyond k ~ 15; the running term never
    # leaves the representable range): i_l = x^l/(2l+1)!! * sum_k t_k,
    # t_0 = 1, t_k = t_{k-1} * x^2 / (2k (2l+2k+1)) ---
    series_out = []
    for l in range(lmax + 1):
        def body(k, carry, l=l):
            t, s = carry
            kf = k.astype(jnp.float32) + 1.0
            denom = 2.0 * kf * (2.0 * l + 2.0 * kf + 1.0)
            t = df.div(df.mul(t, x2), df.DF64(denom, jnp.zeros_like(denom)))
            return (t, df.add(s, t))

        one = df.const(1.0, x.hi.shape)
        _, s = jax.lax.fori_loop(0, _NSERIES, body, (one, one))
        acc = df.mul(df.mul(s, emx), df.const(1.0 / _dfact(2 * l + 1), x.hi.shape))
        for _ in range(l):
            acc = df.mul(acc, xs)
        series_out.append(acc)

    # --- asymptotic branch ---
    xl = df.where(x.hi > _X_SWITCH, x, df.const(_X_SWITCH, x.hi.shape))
    inv_x = df.recip(xl)
    inv_2x = df.scale_pow2(inv_x, 0.5)
    em2x = df.exp(df.mul_f32(xl, -2.0))
    asym_out = []
    for l in range(lmax + 1):
        c = _asym_coefs(l)
        # p = sum (-1)^k c_k (2x)^-k ; q = sum c_k (2x)^-k  (Horner)
        p = df.const(float(c[l] * (-1) ** l), x.hi.shape)
        q = df.const(float(c[l]), x.hi.shape)
        for k in range(l - 1, -1, -1):
            p = df.add(df.mul(p, inv_2x), df.const(float(c[k] * (-1) ** k), x.hi.shape))
            q = df.add(df.mul(q, inv_2x), df.const(float(c[k]), x.hi.shape))
        sign = -1.0 if (l % 2 == 0) else 1.0  # (-1)^{l+1}
        tot = df.add(p, df.mul_f32(df.mul(em2x, q), sign))
        asym_out.append(df.mul(tot, inv_2x))

    use_series = x.hi <= _X_SWITCH
    return [
        df.where(use_series, series_out[l], asym_out[l]) for l in range(lmax + 1)
    ]


def ine_np(lmax: int, x: np.ndarray):
    """f64 numpy oracle: i~_l = sqrt(pi/2x) * ive(l+1/2, x) (overflow-safe)."""
    from scipy.special import ive

    x = np.asarray(x, np.float64)
    xs = np.maximum(x, 1e-300)
    pref = np.sqrt(np.pi / (2.0 * xs))
    out = np.stack([pref * ive(l + 0.5, xs) for l in range(lmax + 1)])
    # exact x = 0 limit: i_l(0) = delta_{l0}
    out[:, x == 0] = 0.0
    out[0, x == 0] = 1.0
    return out


__all__ = ["ine_df64", "ine_np"]
