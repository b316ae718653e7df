"""Arithmetic shims so kernel recurrences are generic over precision tier.

The reference instantiates its CUDA templates per DataType
(/root/reference/jqc/backend/jk.py routing fp32/fp64 kernels); here the
same effect is achieved by writing recurrences against this minimal
arithmetic interface and instantiating with ``F32`` (plain float32 jnp)
or ``DF`` (compensated double-float pairs from ops/df64.py).
"""

from __future__ import annotations

import jax.numpy as jnp

from . import df64 as _df


class F32:
    """Plain float32 arithmetic (FP32 task tier)."""

    dtype = "f32"

    @staticmethod
    def const(c, shape=()):
        return jnp.full(shape, c, jnp.float32) if shape else jnp.float32(c)

    @staticmethod
    def from_f32(x):
        return x

    add = staticmethod(lambda a, b: a + b)
    sub = staticmethod(lambda a, b: a - b)
    mul = staticmethod(lambda a, b: a * b)
    div = staticmethod(lambda a, b: a / b)
    neg = staticmethod(lambda a: -a)
    recip = staticmethod(lambda a: 1.0 / a)
    sqrt = staticmethod(jnp.sqrt)
    exp = staticmethod(jnp.exp)

    @staticmethod
    def mul_f32(a, b):
        return a * b

    @staticmethod
    def add_f32(a, b):
        return a + b

    @staticmethod
    def scale_pow2(a, s):
        return a * s

    @staticmethod
    def where(p, a, b):
        return jnp.where(p, a, b)

    @staticmethod
    def hi(a):
        return a

    @staticmethod
    def zeros_like(a):
        return jnp.zeros_like(a)

    @staticmethod
    def boys(mmax, x):
        from .boys import boys_f32

        f = boys_f32(mmax, x)
        return [f[m] for m in range(mmax + 1)]

    @staticmethod
    def stack(vals, axis=-1):
        return jnp.stack(vals, axis=axis)

    @staticmethod
    def take(x, idx, axis):
        return jnp.take(x, idx, axis=axis)

    @staticmethod
    def bmm(a, b):
        """Batched matmul (T,m,k)@(T,k,n) -> (T,m,n)."""
        return jnp.einsum("tmk,tkn->tmn", a, b, preferred_element_type=jnp.float32)

    @staticmethod
    def zeros(shape):
        return jnp.zeros(shape, jnp.float32)


class DF:
    """Compensated double-float arithmetic (FP64 task tier)."""

    dtype = "df64"

    const = staticmethod(_df.const)

    @staticmethod
    def from_f32(x):
        return _df.from_f32(x)

    add = staticmethod(_df.add)
    sub = staticmethod(_df.sub)
    mul = staticmethod(_df.mul)
    div = staticmethod(_df.div)
    neg = staticmethod(_df.neg)
    recip = staticmethod(_df.recip)
    sqrt = staticmethod(_df.sqrt)
    exp = staticmethod(_df.exp)
    mul_f32 = staticmethod(_df.mul_f32)
    add_f32 = staticmethod(_df.add_f32)
    scale_pow2 = staticmethod(_df.scale_pow2)
    where = staticmethod(_df.where)

    @staticmethod
    def hi(a):
        return a.hi

    @staticmethod
    def zeros_like(a):
        return _df.DF64(jnp.zeros_like(a.hi), jnp.zeros_like(a.lo))

    @staticmethod
    def boys(mmax, x):
        from .boys import boys_df64

        return boys_df64(mmax, x)

    @staticmethod
    def stack(vals, axis=-1):
        return _df.DF64(
            jnp.stack([v.hi for v in vals], axis=axis),
            jnp.stack([v.lo for v in vals], axis=axis),
        )

    @staticmethod
    def take(x, idx, axis):
        return _df.DF64(
            jnp.take(x.hi, idx, axis=axis), jnp.take(x.lo, idx, axis=axis)
        )

    @staticmethod
    def bmm(a, b):
        """Batched DF64 matmul via fori over the contraction axis.

        Keeps the trace small (graph = one fma step); the contraction is
        compensated at every step so the result is DF64-accurate.  The
        planned fast path is an int8-limb MXU decomposition (Ozaki-style);
        this VPU version is the correctness baseline.
        """
        import jax

        k = a.hi.shape[-1]

        def body(i, acc):
            ai = _df.DF64(a.hi[:, :, i], a.lo[:, :, i])  # (T, m)
            bi = _df.DF64(b.hi[:, i, :], b.lo[:, i, :])  # (T, n)
            prod = _df.mul(
                _df.DF64(ai.hi[:, :, None], ai.lo[:, :, None]),
                _df.DF64(bi.hi[:, None, :], bi.lo[:, None, :]),
            )
            return _df.add(acc, prod)

        T, m = a.hi.shape[0], a.hi.shape[1]
        n = b.hi.shape[2]
        init = _df.DF64(
            jnp.zeros((T, m, n), jnp.float32), jnp.zeros((T, m, n), jnp.float32)
        )
        return jax.lax.fori_loop(0, k, body, init)

    @staticmethod
    def zeros(shape):
        return _df.DF64(jnp.zeros(shape, jnp.float32), jnp.zeros(shape, jnp.float32))


def get_arith(tier: str):
    return {"f32": F32, "fp32": F32, "df64": DF, "fp64": DF}[tier]
