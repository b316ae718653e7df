"""DF64: compensated double-float (float32 pair) arithmetic for TPU.

TPUs have no native float64 ALU.  The reference implementation relies on
native FP64 CUDA kernels for its high-accuracy path (e.g. the `double`
accumulators in /root/reference/jqc/backend/jk/1q1t.cu:49-50); on TPU we
realise the "FP64" precision tier with error-free transformations over
float32 pairs (Dekker/Knuth double-word arithmetic), giving ~48 bits of
effective mantissa (~1.5e-14 relative) on the VPU.

A DF64 number is a pair of float32 arrays ``(hi, lo)`` with
``|lo| <= ulp(hi)/2`` and value ``hi + lo``.  All functions are pure and
shape-polymorphic, usable both in traced jax code and inside Pallas
kernel bodies.

Implementation notes:
 - ``two_prod`` uses Dekker splitting (no FMA is exposed through XLA; we
   must not rely on the compiler contracting mul+add).
 - Operations are written so XLA cannot legally re-associate them:
   XLA treats float arithmetic as non-associative and performs no
   value-changing rewrites at the default settings.  ``tests/test_df64.py``
   validates on-device error bounds to guard against regressions.
"""

from __future__ import annotations

from typing import NamedTuple, Union

import jax
import jax.numpy as jnp
import numpy as np

_SPLIT = 4097.0  # 2**12 + 1, Dekker split constant for float32 (24-bit mantissa)


class DF64(NamedTuple):
    """A double-float number: value = hi + lo, both float32."""

    hi: jax.Array
    lo: jax.Array

    # -- python operator sugar (works under tracing) --
    def __add__(self, other):
        return add(self, _coerce(other))

    def __radd__(self, other):
        return add(_coerce(other), self)

    def __sub__(self, other):
        return sub(self, _coerce(other))

    def __rsub__(self, other):
        return sub(_coerce(other), self)

    def __mul__(self, other):
        return mul(self, _coerce(other))

    def __rmul__(self, other):
        return mul(_coerce(other), self)

    def __truediv__(self, other):
        return div(self, _coerce(other))

    def __rtruediv__(self, other):
        return div(_coerce(other), self)

    def __neg__(self):
        return DF64(-self.hi, -self.lo)

    @property
    def shape(self):
        return self.hi.shape

    @property
    def ndim(self):
        return self.hi.ndim

    def __getitem__(self, idx):
        return DF64(self.hi[idx], self.lo[idx])

    def reshape(self, *shape):
        return DF64(self.hi.reshape(*shape), self.lo.reshape(*shape))

    def sum(self, axis=None):
        return dfsum(self, axis=axis)

    def astype_f32(self):
        return self.hi + self.lo


DFLike = Union[DF64, jax.Array, float, int]


def _coerce(x: DFLike) -> DF64:
    if isinstance(x, DF64):
        return x
    if isinstance(x, (float, int, np.floating, np.integer)):
        return const(float(x))
    # jax array assumed float32 exact
    return DF64(jnp.asarray(x, jnp.float32), jnp.zeros_like(x, jnp.float32))


def const(x: float, shape=()) -> DF64:
    """Exact DF64 representation of a python float (split via float64 on host)."""
    hi = np.float32(x)
    lo = np.float32(np.float64(x) - np.float64(hi))
    if shape == ():
        return DF64(jnp.float32(hi), jnp.float32(lo))
    return DF64(jnp.full(shape, hi, jnp.float32), jnp.full(shape, lo, jnp.float32))


def from_f64(x) -> DF64:
    """Split host float64 array data into a DF64 pair (host-side, exact)."""
    x = np.asarray(x, np.float64)
    hi = x.astype(np.float32)
    lo = (x - hi.astype(np.float64)).astype(np.float32)
    return DF64(jnp.asarray(hi), jnp.asarray(lo))


def to_f64(x: DF64) -> np.ndarray:
    """Reassemble to host float64 (for tests / host-side linear algebra)."""
    return np.asarray(x.hi, np.float64) + np.asarray(x.lo, np.float64)


def from_f32(x) -> DF64:
    x = jnp.asarray(x, jnp.float32)
    return DF64(x, jnp.zeros_like(x))


# --------------------------------------------------------------- CPU backend
#
# XLA:CPU evaluates fused f32 chains with excess precision / simplifies
# algebra by default, which collapses error-free transformations like
# `t - (t - a)` back to `a` and silently destroys the lo limb (observed:
# broadcast-shaped jitted mul degrading to 5e-8 even under
# --xla_allow_excess_precision=false).  Two countermeasures:
#  - EFT cores (two_sum/two_prod) wrap every intermediate in
#    lax.reduce_precision(8, 23), forcing IEEE f32 rounding.  This is
#    correct but compiles pathologically slowly when composed into deep
#    expression chains (boys_df64 at mmax=18: >250 s on CPU).
#  - Composite ops therefore switch to *native-f64 emulation* on CPU when
#    jax_enable_x64 is on (the unit-test configuration): promote hi+lo to
#    f64, compute, split back.  Accuracy (~2^-48) matches real DF64 and
#    graphs stay lean.  The true EFT path is what runs on TPU, where f32
#    is exact IEEE (validated bit-exact two_prod on chip) and no barrier
#    or emulation is needed.
# Override with JQC_DF64_MODE=eft|emul.
_MODE = None  # "tpu-eft" | "cpu-eft" | "emul"


def _mode() -> str:
    global _MODE
    if _MODE is None:
        import os

        forced = os.environ.get("JQC_DF64_MODE")
        if forced in ("eft", "emul"):
            _MODE = "cpu-eft" if forced == "eft" else "emul"
        elif jax.default_backend() == "cpu":
            _MODE = "emul" if jax.config.jax_enable_x64 else "cpu-eft"
        else:
            _MODE = "tpu-eft"
    return _MODE


def _rp(x):
    if _mode() == "tpu-eft":
        return x
    return jax.lax.reduce_precision(x, 8, 23)


def _up(a: DF64):
    """Promote to native f64 (emulation mode only)."""
    return a.hi.astype(jnp.float64) + a.lo.astype(jnp.float64)


def _down(x) -> DF64:
    """Split native f64 back into a normalized DF64 pair."""
    hi = x.astype(jnp.float32)
    lo = (x - hi.astype(jnp.float64)).astype(jnp.float32)
    return DF64(hi, lo)


def two_sum(a, b):
    """Error-free sum: a+b = s+err exactly."""
    s = _rp(a + b)
    bb = _rp(s - a)
    err = _rp(_rp(a - _rp(s - bb)) + _rp(b - bb))
    return s, err


def quick_two_sum(a, b):
    """Error-free sum assuming |a| >= |b|."""
    s = _rp(a + b)
    err = _rp(b - _rp(s - a))
    return s, err


def _split(a):
    t = _rp(a * _SPLIT)
    hi = _rp(t - _rp(t - a))
    lo = _rp(a - hi)
    return hi, lo


def two_prod(a, b):
    """Error-free product: a*b = p+err exactly (Dekker, FMA-free)."""
    p = _rp(a * b)
    ah, al = _split(a)
    bh, bl = _split(b)
    err = _rp(
        _rp(_rp(_rp(ah * bh) - p) + _rp(ah * bl) + _rp(al * bh)) + _rp(al * bl)
    )
    return p, err


# ---------------------------------------------------------------- arithmetic
def add(a: DF64, b: DF64) -> DF64:
    if _mode() == "emul":
        return _down(_up(a) + _up(b))
    s, e = two_sum(a.hi, b.hi)
    t, f = two_sum(a.lo, b.lo)
    e = _rp(e + t)
    s, e = quick_two_sum(s, e)
    e = _rp(e + f)
    s, e = quick_two_sum(s, e)
    return DF64(s, e)


def add_f32(a: DF64, b) -> DF64:
    if _mode() == "emul":
        return _down(_up(a) + jnp.asarray(b, jnp.float32).astype(jnp.float64))
    s, e = two_sum(a.hi, b)
    e = _rp(e + a.lo)
    s, e = quick_two_sum(s, e)
    return DF64(s, e)


def sub(a: DF64, b: DF64) -> DF64:
    return add(a, DF64(-b.hi, -b.lo))


def mul(a: DF64, b: DF64) -> DF64:
    if _mode() == "emul":
        return _down(_up(a) * _up(b))
    p, e = two_prod(a.hi, b.hi)
    e = _rp(e + _rp(a.hi * b.lo + a.lo * b.hi))
    p, e = quick_two_sum(p, e)
    return DF64(p, e)


def mul_f32(a: DF64, b) -> DF64:
    if _mode() == "emul":
        return _down(_up(a) * jnp.asarray(b, jnp.float32).astype(jnp.float64))
    p, e = two_prod(a.hi, b)
    e = _rp(e + _rp(a.lo * b))
    p, e = quick_two_sum(p, e)
    return DF64(p, e)


def div(a: DF64, b: DF64) -> DF64:
    if _mode() == "emul":
        return _down(_up(a) / _up(b))
    q1 = a.hi / b.hi
    r = sub(a, mul_f32(b, q1))
    q2 = r.hi / b.hi
    r = sub(r, mul_f32(b, q2))
    q3 = r.hi / b.hi
    q, e = quick_two_sum(q1, q2)
    return add_f32(DF64(q, e), q3)


def recip(b: DF64) -> DF64:
    return div(const(1.0), b)


def sqrt(a: DF64) -> DF64:
    """sqrt via one Newton step on the f32 estimate (quadratic convergence)."""
    if _mode() == "emul":
        return _down(jnp.sqrt(_up(a)))
    x = jax.lax.rsqrt(jnp.maximum(a.hi, jnp.float32(np.finfo(np.float32).tiny)))
    # y0 = a.hi * x ~ sqrt(a); refine: y = y0 + (a - y0^2) * x / 2
    y0 = a.hi * x
    y0sq = DF64(*two_prod(y0, y0))
    d = sub(a, y0sq)
    y = add_f32(mul_f32(DF64(d.hi * (0.5 * x), d.lo * (0.5 * x)), 1.0), y0)
    # guard a == 0
    zero = a.hi == 0
    return DF64(jnp.where(zero, 0.0, y.hi), jnp.where(zero, 0.0, y.lo))


def neg(a: DF64) -> DF64:
    return DF64(-a.hi, -a.lo)


def abs_(a: DF64) -> DF64:
    flip = a.hi < 0
    return DF64(jnp.where(flip, -a.hi, a.hi), jnp.where(flip, -a.lo, a.lo))


def scale_pow2(a: DF64, s) -> DF64:
    """Multiply by a power of two (exact)."""
    return DF64(a.hi * s, a.lo * s)


def where(pred, a: DF64, b: DF64) -> DF64:
    return DF64(jnp.where(pred, a.hi, b.hi), jnp.where(pred, a.lo, b.lo))


def dfsum(a: DF64, axis=None) -> DF64:
    """Sum-reduce a DF64 array with compensated accumulation.

    Uses a sequential fori_loop along the reduced axis (exact up to DF64
    precision); axis=None reduces all axes.
    """
    if _mode() == "emul":
        return _down(jnp.sum(_up(a), axis=axis))
    if axis is None:
        flat = DF64(a.hi.reshape(-1), a.lo.reshape(-1))
        n = flat.hi.shape[0]

        def body(i, acc):
            return add(acc, DF64(flat.hi[i], flat.lo[i]))

        return jax.lax.fori_loop(0, n, body, const(0.0))
    # reduce along a single axis by scanning
    axis = axis % a.hi.ndim
    hi = jnp.moveaxis(a.hi, axis, 0)
    lo = jnp.moveaxis(a.lo, axis, 0)
    n = hi.shape[0]

    def body(i, acc):
        return add(acc, DF64(hi[i], lo[i]))

    init = DF64(jnp.zeros(hi.shape[1:], jnp.float32), jnp.zeros(hi.shape[1:], jnp.float32))
    return jax.lax.fori_loop(0, n, body, init)


# ---------------------------------------------------------- transcendentals
_LN2 = 0.6931471805599453
_EXP_COEFS = None


def exp(a: DF64) -> DF64:
    """DF64 exp via range reduction exp(k ln2 + r) = 2^k exp(r), |r|<=ln2/2.

    Taylor series of degree 13 in DF64 gives |r|^14/14! < 4e-13 * 0.35^14
    ~= 2e-19 truncation -- below DF64 ulp.
    """
    if _mode() == "emul":
        return _down(jnp.exp(_up(a)))
    # k = round(a / ln2) computed in f32 is exact for |k| < 2^23
    k = jnp.round(a.hi * np.float32(1.0 / _LN2))
    ln2 = const(_LN2)
    r = sub(a, mul_f32(ln2, k))
    # Horner in DF64: exp(r) = 1 + r/1*(1 + r/2*(1 + r/3*(... (1 + r/13))))
    acc = const(1.0, r.hi.shape)
    for d in range(13, 0, -1):
        acc = mul(mul(acc, r), const(1.0 / d, r.hi.shape))
        acc = add(acc, const(1.0, r.hi.shape))
    # scale by 2^k in two exact steps (jnp.exp2 is NOT exact at integer args
    # on XLA -- ~5e-6 off -- so build the power of two from exponent bits).
    # |k| <= 252 covered; below exp(-174) the result underflows to 0 anyway.
    k_int = k.astype(jnp.int32)
    k_half = k_int // 2
    s1 = _pow2_exact(jnp.clip(k_half, -126, 127))
    s2 = _pow2_exact(jnp.clip(k_int - k_half, -126, 127))
    out = DF64(acc.hi * s1 * s2, acc.lo * s1 * s2)
    # NOTE: for results < ~2e-31 the lo limb is subnormal and flushes to zero,
    # degrading precision to plain f32 -- negligible at such magnitudes.
    tiny = a.hi < -174.0
    return DF64(jnp.where(tiny, 0.0, out.hi), jnp.where(tiny, 0.0, out.lo))


def _pow2_exact(n):
    """Exact float32 2**n for int32 n in [-126, 127] via exponent bits."""
    bits = (n + 127).astype(jnp.int32) << 23
    return jax.lax.bitcast_convert_type(bits, jnp.float32)


def log(a: DF64) -> DF64:
    """DF64 log via Newton iteration on exp: x_{n+1} = x_n + a*exp(-x_n) - 1."""
    if _mode() == "emul":
        return _down(jnp.log(_up(a)))
    x0 = jnp.log(jnp.maximum(a.hi, np.float32(np.finfo(np.float32).tiny)))
    x = DF64(x0, jnp.zeros_like(x0))
    for _ in range(2):
        e = exp(neg(x))
        x = add(x, sub(mul(a, e), const(1.0, x0.shape)))
    return x


def powi(a: DF64, n: int) -> DF64:
    """Integer power by repeated squaring (n >= 0 static)."""
    if n == 0:
        return const(1.0, a.hi.shape)
    result = None
    base = a
    while n > 0:
        if n & 1:
            result = base if result is None else mul(result, base)
        n >>= 1
        if n:
            base = mul(base, base)
    return result


__all__ = [
    "DF64", "const", "from_f64", "from_f32", "to_f64",
    "two_sum", "quick_two_sum", "two_prod",
    "add", "add_f32", "sub", "mul", "mul_f32", "div", "recip", "sqrt",
    "neg", "abs_", "where", "dfsum", "exp", "log", "powi", "scale_pow2",
]
