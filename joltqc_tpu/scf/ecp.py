"""TPU ECP engine: batched type1/type2 semi-local integrals in DF64.

Reference counterpart: /root/reference/jqc/backend/ecp.py + the CUDA
kernels ecp_type1.cu / ecp_type2.cu (one 128-thread block per shell-pair
task, Gauss-Chebyshev radial quadrature, generated angular tables).
TPU-native redesign:

 - a *task* is one (shell_i, shell_j, ECP center+channel) triple of a
   fixed class (li, lj, nprim buckets, channel l / local, channel prim
   count); a batch of T tasks is processed with every stage vectorized
   over T -- the angular algebra becomes batched (DF64) matmuls against
   STATIC host-precomputed sparse tables instead of the reference's
   8 kLoC of generated CUDA angular code;
 - the radial quadrature is a per-task Gauss-Legendre rule mapped onto
   the analytic support window of the integrand (the scheme validated to
   machine precision by the numpy oracle, mol/ecp_np.py:_radial_grid),
   instead of the reference's fixed 128-point Gauss-Chebyshev rule;
 - everything runs in DF64 (float32-pair) arithmetic: the reference
   keeps ECP FP64-only (README.md:93) and so do we;
 - accumulation into the ECP matrix is a host-side scatter of per-task
   (nfa, nfb) blocks -- ECP cost is O(nbas^2 * necp), far off the SCF
   hot path.

Math (same operator algebra as the oracle, mol/ecp_np.py docstring):
type2 couples shell i to the projector via per-shell angular factors
ang_i[(fi, s_i, lam_i), m] and a radial table
rad[t, (s_i, lam_i), (s_j, lam_j)] = sum_r w U_l r^{2+s_i+s_j}
    e^{-a(r-|Di|)^2 - b(r-|Dj|)^2} i~_{lam_i}(2a|Di|r) i~_{lam_j}(2b|Dj|r);
type1 couples both shells to the local channel through the combined
k = 2(a Di + b Dj) direction.
"""

from __future__ import annotations

from functools import lru_cache
from math import comb

import numpy as np
import jax
import jax.numpy as jnp

from ..mol.ecp import ECPChannel
from ..mol.layout import BasisLayout
from ..ops import df64 as df
from ..ops.bessel import ine_df64
from ..ops.harmonics import _sphere_monomial_integral, cart_components, real_sph_ortho
from .tasks import ShellClass, build_shell_classes

_NQUAD = 128  # radial Gauss-Legendre points (reference: 128-pt Chebyshev)
_WINDOW = 12.0  # +- window half-width in units of sigma
_SCREEN_EXP = 45.0  # drop tasks whose peak integrand is below e^-45


# ===================================================================== DF64
# small shape helpers (DF64 carries (hi, lo) float32 pairs)
def _d(hi_lo):
    return df.DF64(*hi_lo)


def _reshape(x, shape):
    return df.DF64(x.hi.reshape(shape), x.lo.reshape(shape))


def _transpose(x, axes):
    return df.DF64(x.hi.transpose(axes), x.lo.transpose(axes))


def _const_like_shape(val, shape):
    return df.const(val, shape)


def _bmm(a, b):
    """Batched DF64 matmul (T,m,k)@(T,k,n) via compensated fori over k."""
    k = a.hi.shape[-1]

    def body(i, acc):
        ai = df.DF64(a.hi[:, :, i], a.lo[:, :, i])
        bi = df.DF64(b.hi[:, i, :], b.lo[:, i, :])
        prod = df.mul(
            df.DF64(ai.hi[:, :, None], ai.lo[:, :, None]),
            df.DF64(bi.hi[:, None, :], bi.lo[:, None, :]),
        )
        return df.add(acc, prod)

    T, m = a.hi.shape[0], a.hi.shape[1]
    n = b.hi.shape[2]
    init = df.DF64(jnp.zeros((T, m, n), jnp.float32), jnp.zeros((T, m, n), jnp.float32))
    return jax.lax.fori_loop(0, k, body, init)


def _onehot_bmm(x, onehot):
    """(T, m, R) DF64 @ static 0/1 (R, Q) -> (T, m, Q) DF64 (exact)."""
    T = x.hi.shape[0]
    oh = jnp.asarray(onehot, jnp.float32)
    ohb = jnp.broadcast_to(oh[None], (T,) + oh.shape)
    return _bmm(x, df.DF64(ohb, jnp.zeros_like(ohb)))


# ================================================================ static
@lru_cache(maxsize=None)
def _mono_basis(lam_max: int):
    """Monomial exponents covering the Y_0..Y_lam_max blocks.

    Returns (exps (K,3) int array, [slice per lam])."""
    exps, blocks = [], []
    for lam in range(lam_max + 1):
        start = len(exps)
        exps.extend(cart_components(lam))
        blocks.append(slice(start, len(exps)))
    return np.array(exps, np.int32), blocks


@lru_cache(maxsize=None)
def _mono_Y(q: tuple, lam: int) -> np.ndarray:
    """S[mu] = int w^q Y_lam,mu dOmega (exact)."""
    coef = real_sph_ortho(lam)
    comps = cart_components(lam)
    out = np.zeros(2 * lam + 1)
    for m in range(2 * lam + 1):
        for c, (a, b, cc) in zip(coef[m], comps):
            if c != 0.0:
                out[m] += c * _sphere_monomial_integral(q[0] + a, q[1] + b, q[2] + cc)
    return out


@lru_cache(maxsize=None)
def _mono_YY(q: tuple, lam: int, l: int) -> np.ndarray:
    """T[mu, m] = int w^q Y_lam,mu Y_lm dOmega (exact)."""
    ca, compa = real_sph_ortho(lam), cart_components(lam)
    cb, compb = real_sph_ortho(l), cart_components(l)
    out = np.zeros((2 * lam + 1, 2 * l + 1))
    for mu in range(2 * lam + 1):
        for m in range(2 * l + 1):
            v = 0.0
            for c1, (a1, b1, c1z) in zip(ca[mu], compa):
                if c1 == 0.0:
                    continue
                for c2, (a2, b2, c2z) in zip(cb[m], compb):
                    if c2 == 0.0:
                        continue
                    v += c1 * c2 * _sphere_monomial_integral(
                        q[0] + a1 + a2, q[1] + b1 + b2, q[2] + c1z + c2z
                    )
            out[mu, m] = v
    return out


def _binom_rows(lx, ly, lz):
    """[(p, binom_coef)] for the (r w - D)^(lx,ly,lz) expansion."""
    out = []
    for px in range(lx + 1):
        for py in range(ly + 1):
            for pz in range(lz + 1):
                c = comb(lx, px) * comb(ly, py) * comb(lz, pz)
                out.append(((px, py, pz), float(c)))
    return out


@lru_cache(maxsize=None)
def _t2_shell_meta(l_sh: int, l_ecp: int):
    """Static angular metadata for one shell side of a type-2 task class.

    Row space: (cart comp fi, binomial term p, bessel order lam), pruned
    when the combined angular weight vanishes.  Per row:
      e_pow (3,)  -- exponents of the D_i-vector power (sign folded in)
      slot        -- flat (fi, s=|p|, lam) output slot
      W (K, 2l+1) -- monomials-of-Dhat -> m-vector map, includes the
                     binomial coefficient, (-1)^|e|, and the 4pi factor
    Returns dict(e_pow (R,3), slot (R,), W (R,K,M), nslot, ns, nlam, K).
    """
    comps = cart_components(l_sh)
    lam_max = l_sh + l_ecp
    mono_exps, blocks = _mono_basis(lam_max)
    K = len(mono_exps)
    M = 2 * l_ecp + 1
    ns, nlam = l_sh + 1, lam_max + 1
    e_pow, slot, W = [], [], []
    for fi, (ax, ay, az) in enumerate(comps):
        for (p, cb) in _binom_rows(ax, ay, az):
            e = (ax - p[0], ay - p[1], az - p[2])
            s = sum(p)
            sign = (-1.0) ** sum(e)
            for lam in range(lam_max + 1):
                T = _mono_YY(p, lam, l_ecp)  # (mu, M)
                S = real_sph_ortho(lam)  # (mu, K_lam)
                Wrow = np.zeros((K, M))
                Wrow[blocks[lam]] = 4.0 * np.pi * cb * sign * (S.T @ T)
                if np.abs(Wrow).max() < 1e-16:
                    continue
                e_pow.append(e)
                slot.append((fi * ns + s) * nlam + lam)
                W.append(Wrow)
    return dict(
        e_pow=np.array(e_pow, np.int32),
        slot=np.array(slot, np.int32),
        W=np.array(W),  # (R, K, M)
        nslot=len(comps) * ns * nlam,
        ns=ns,
        nlam=nlam,
        K=K,
        lam_max=lam_max,
        nf=len(comps),
    )


@lru_cache(maxsize=None)
def _t1_pair_meta(la: int, lb: int):
    """Static angular metadata for a type-1 (local channel) task class.

    Row space: (fi, fj, p_i, p_j, lam) pruned on vanishing V.  Per row:
      e_i, e_j (3,) -- D_i / D_j vector power exponents (signs folded)
      slot_out      -- fi*nfb + fj
      slot_rad      -- s*(lam_max+1) + lam,  s = |p_i + p_j|
      V (K,)        -- monomials-of-khat -> scalar angular weight
    """
    compsa, compsb = cart_components(la), cart_components(lb)
    lam_max = la + lb
    mono_exps, blocks = _mono_basis(lam_max)
    K = len(mono_exps)
    ns, nlam = la + lb + 1, lam_max + 1
    e_i, e_j, slot_out, slot_rad, V = [], [], [], [], []
    for fi, (ax, ay, az) in enumerate(compsa):
        rows_i = _binom_rows(ax, ay, az)
        for fj, (bx, by, bz) in enumerate(compsb):
            rows_j = _binom_rows(bx, by, bz)
            for (pi, cbi) in rows_i:
                ei = (ax - pi[0], ay - pi[1], az - pi[2])
                for (pj, cbj) in rows_j:
                    ej = (bx - pj[0], by - pj[1], bz - pj[2])
                    q = (pi[0] + pj[0], pi[1] + pj[1], pi[2] + pj[2])
                    s = sum(q)
                    sign = (-1.0) ** (sum(ei) + sum(ej))
                    for lam in range(lam_max + 1):
                        Sq = _mono_Y(q, lam)  # (mu,)
                        if np.abs(Sq).max() < 1e-16:
                            continue
                        S = real_sph_ortho(lam)  # (mu, K_lam)
                        Vrow = np.zeros(K)
                        Vrow[blocks[lam]] = 4.0 * np.pi * cbi * cbj * sign * (Sq @ S)
                        if np.abs(Vrow).max() < 1e-16:
                            continue
                        e_i.append(ei)
                        e_j.append(ej)
                        slot_out.append(fi * len(compsb) + fj)
                        slot_rad.append(s * nlam + lam)
                        V.append(Vrow)
    return dict(
        e_i=np.array(e_i, np.int32),
        e_j=np.array(e_j, np.int32),
        slot_out=np.array(slot_out, np.int32),
        slot_rad=np.array(slot_rad, np.int32),
        V=np.array(V),  # (R, K)
        ns=ns,
        nlam=nlam,
        K=K,
        lam_max=lam_max,
        nfa=len(compsa),
        nfb=len(compsb),
    )


@lru_cache(maxsize=None)
def _leg_nodes():
    x, w = np.polynomial.legendre.leggauss(_NQUAD)
    return x, w


# ============================================================== device ops
def _safe_unit(D):
    """DF64 (T,3) -> (Dhat DF64 (T,3), Dmag DF64 (T,)); D=0 -> z-hat."""
    r2 = df.add(
        df.add(df.mul(_col(D, 0), _col(D, 0)), df.mul(_col(D, 1), _col(D, 1))),
        df.mul(_col(D, 2), _col(D, 2)),
    )
    tiny = r2.hi < 1e-24
    r2s = df.where(tiny, df.const(1.0, r2.hi.shape), r2)
    mag = df.sqrt(r2s)
    inv = df.recip(mag)
    comps = []
    for ax in range(3):
        c = df.mul(_col(D, ax), inv)
        fallback = df.const(1.0 if ax == 2 else 0.0, c.hi.shape)
        comps.append(df.where(tiny, fallback, c))
    mag = df.where(tiny, df.const(0.0, mag.hi.shape), mag)
    hat = df.DF64(
        jnp.stack([c.hi for c in comps], -1), jnp.stack([c.lo for c in comps], -1)
    )
    return hat, mag


def _col(x, i):
    return df.DF64(x.hi[..., i], x.lo[..., i])


def _pow_table(x, nmax: int):
    """DF64 (T,3) -> (T, 3, nmax+1) powers x^0..x^nmax."""
    outs = [df.const(1.0, x.hi.shape)]
    for _ in range(nmax):
        outs.append(df.mul(outs[-1], x))
    return df.DF64(
        jnp.stack([o.hi for o in outs], -1), jnp.stack([o.lo for o in outs], -1)
    )


def _gather_pow(pows, e_pow):
    """pows (T,3,n+1) DF64, e_pow (R,3) -> (T,R) DF64 product of powers."""
    out = None
    for ax in range(3):
        g = df.DF64(
            jnp.take(pows.hi[:, ax, :], e_pow[:, ax], axis=1),
            jnp.take(pows.lo[:, ax, :], e_pow[:, ax], axis=1),
        )
        out = g if out is None else df.mul(out, g)
    return out


def _mono_vec(hat, lam_max: int):
    """DF64 unit vectors (T,3) -> monomial vector (T,K)."""
    exps, _ = _mono_basis(lam_max)
    pows = _pow_table(hat, lam_max)
    return _gather_pow(pows, exps)


def _radial_grid(p, kmag, zmin):
    """Per-task Gauss-Legendre nodes/weights on the integrand support.

    p, kmag: DF64 (T,); zmin (T,) f32.  Returns (r, w) DF64 (T, NQ)."""
    x, w = _leg_nodes()
    # nodes/weights as exact DF64 splits of the f64 rule -- a single-f32
    # rounding here costs ~1e-8 relative in every radial integral
    x_hi = x.astype(np.float32)
    x_lo = (x - x_hi.astype(np.float64)).astype(np.float32)
    w_hi = w.astype(np.float32)
    w_lo = (w - w_hi.astype(np.float64)).astype(np.float32)
    xs = df.DF64(jnp.asarray(x_hi)[None, :], jnp.asarray(x_lo)[None, :])
    ws = df.DF64(jnp.asarray(w_hi)[None, :], jnp.asarray(w_lo)[None, :])
    ptot = df.add_f32(p, zmin)
    inv = df.recip(ptot)
    rstar = df.mul(df.mul(kmag, inv), df.const(0.5, p.hi.shape))
    sigma = df.sqrt(df.mul(inv, df.const(0.5, p.hi.shape)))
    lo = df.sub(rstar, df.mul_f32(sigma, _WINDOW))
    lo = df.where(lo.hi < 0.0, df.const(0.0, lo.hi.shape), lo)
    hi = df.add(rstar, df.mul_f32(sigma, _WINDOW))
    half = df.mul(df.sub(hi, lo), df.const(0.5, lo.hi.shape))
    # r = lo + half*(x+1); weights w * half
    r = df.add(
        df.add(_bcast(lo, _NQUAD), df.mul(_bcast(half, _NQUAD), xs)),
        _bcast(half, _NQUAD),
    )
    wq = df.mul(_bcast(half, _NQUAD), ws)
    return r, wq


def _bcast(x, n):
    """(T,) DF64 -> (T, n) broadcast view."""
    return df.DF64(
        jnp.broadcast_to(x.hi[:, None], x.hi.shape + (n,)),
        jnp.broadcast_to(x.lo[:, None], x.lo.shape + (n,)),
    )


def _channel_u(r, wq, ch_d, ch_z, ch_n1h):
    """w * U_l(r) * r^2 = sum_k d_k r^{n_k} e^{-z_k r^2} * w.

    r, wq (T,NQ) DF64; ch_d/ch_z (T,KCH) DF64; ch_n1h (T,KCH,3) f32 one-hot
    of the power n in {0,1,2}."""
    KCH = ch_d.hi.shape[1]
    r2 = df.mul(r, r)
    rp = [df.const(1.0, r.hi.shape), r, r2]
    out = df.const(0.0, r.hi.shape)
    for k in range(KCH):
        d = df.DF64(ch_d.hi[:, k, None], ch_d.lo[:, k, None])
        z = df.DF64(ch_z.hi[:, k, None], ch_z.lo[:, k, None])
        ex = df.exp(df.neg(df.mul(z, r2)))
        rn = df.const(0.0, r.hi.shape)
        for pwr in range(3):
            sel = ch_n1h[:, k, pwr][:, None]
            rn = df.add(rn, df.mul_f32(rp[pwr], sel))
        out = df.add(out, df.mul(df.mul(d, rn), ex))
    return df.mul(out, wq)


def _ang_B(meta, D, hat, m_out: int):
    """Angular tensor B[t, nslot, M] for one type-2 shell side."""
    R = len(meta["slot"])
    mono = _mono_vec(hat, meta["lam_max"])  # (T, K)
    powD = _gather_pow(_pow_table(D, max(meta["ns"] - 1, 0)), meta["e_pow"])  # (T,R)
    # ang[t, r, m] = powD * sum_k mono[t,k] W[r,k,m]
    W = meta["W"]  # (R, K, M) f64 -> DF64 consts
    K = meta["K"]
    Tn = mono.hi.shape[0]
    M = m_out

    def body(k, acc):
        mk = df.DF64(mono.hi[:, k, None, None], mono.lo[:, k, None, None])
        Wk_hi = W_hi[k]  # (R, M)
        Wk_lo = W_lo[k]
        Wk = df.DF64(Wk_hi[None], Wk_lo[None])
        return df.add(acc, df.mul(mk, Wk))

    # static DF64 split of W, laid out (K, R, M) for the loop
    Wt = np.ascontiguousarray(np.transpose(W, (1, 0, 2)))
    W_hi_np = Wt.astype(np.float32)
    W_lo_np = (Wt - W_hi_np.astype(np.float64)).astype(np.float32)
    W_hi = jnp.asarray(W_hi_np)
    W_lo = jnp.asarray(W_lo_np)
    acc0 = df.DF64(
        jnp.zeros((Tn, R, M), jnp.float32), jnp.zeros((Tn, R, M), jnp.float32)
    )
    ang = jax.lax.fori_loop(0, K, body, acc0)
    ang = df.mul(ang, df.DF64(powD.hi[:, :, None], powD.lo[:, :, None]))
    # group rows -> slots: (T, M, R) @ (R, nslot)
    onehot = np.zeros((R, meta["nslot"]), np.float32)
    onehot[np.arange(R), meta["slot"]] = 1.0
    B = _onehot_bmm(_transpose(ang, (0, 2, 1)), onehot)  # (T, M, nslot)
    return _transpose(B, (0, 2, 1))  # (T, nslot, M)


# ============================================================== kernels
@lru_cache(maxsize=None)
def _type2_kernel(la, npa, lb, npb, lc, kch):
    """Jitted type-2 batch kernel for one task class.

    fn(geom) -> (T, nfa, nfb) f64-pair stack [hi, lo]."""
    mi = _t2_shell_meta(la, lc)
    mj = _t2_shell_meta(lb, lc)
    M = 2 * lc + 1
    nfa, nfb = mi["nf"], mj["nf"]
    Qi, Qj = mi["ns"] * mi["nlam"], mj["ns"] * mj["nlam"]

    def fn(geom):
        Ai, Aj, C = geom["coord_a"], geom["coord_b"], geom["coord_c"]
        Di = df.sub(Ai, C)
        Dj = df.sub(Aj, C)
        hat_i, dmi = _safe_unit(Di)
        hat_j, dmj = _safe_unit(Dj)
        Bi = _ang_B(mi, Di, hat_i, M)  # (T, nfa*Qi, M)
        Bj_ = _ang_B(mj, Dj, hat_j, M)  # (T, nfb*Qj, M)
        T = Ai.hi.shape[0]

        rad0 = df.DF64(
            jnp.zeros((T, Qi, Qj), jnp.float32), jnp.zeros((T, Qi, Qj), jnp.float32)
        )
        # scan over primitive pairs (graph = ONE pair regardless of depth)
        a_all, b_all, cc_all = _stack_prim_pairs(geom, npa, npb)

        def pair_body(rad, x):
            a, b, cc = x  # (T,) DF64 each
            p = df.add(a, b)
            kmag = df.mul_f32(df.add(df.mul(a, dmi), df.mul(b, dmj)), 2.0)
            r, wq = _radial_grid(p, kmag, geom["zmin"])
            base = _channel_u(r, wq, geom["ch_d"], geom["ch_z"], geom["ch_n"])
            # gaussian factor e^{-a(r-dmi)^2 - b(r-dmj)^2}
            ti = df.sub(r, _bcast(dmi, _NQUAD))
            tj = df.sub(r, _bcast(dmj, _NQUAD))
            expo = df.neg(
                df.add(
                    df.mul(_bcast(a, _NQUAD), df.mul(ti, ti)),
                    df.mul(_bcast(b, _NQUAD), df.mul(tj, tj)),
                )
            )
            base = df.mul(base, df.exp(expo))
            base = df.mul(base, _bcast(cc, _NQUAD))
            xi = df.mul(df.mul_f32(_bcast(df.mul(a, dmi), _NQUAD), 2.0), r)
            xj = df.mul(df.mul_f32(_bcast(df.mul(b, dmj), _NQUAD), 2.0), r)
            Ii = ine_df64(mi["lam_max"], xi)  # list of (T,NQ)
            Ij = ine_df64(mj["lam_max"], xj)
            Pi = _r_powers(r, mi["ns"] - 1)  # list r^0..r^(ns-1)
            Pj = _r_powers(r, mj["ns"] - 1)
            A1 = _outer_sl(Pi, Ii)  # (T, Qi, NQ)
            A2 = _outer_sl(Pj, Ij)  # (T, Qj, NQ)
            A2 = df.mul(A2, df.DF64(base.hi[:, None, :], base.lo[:, None, :]))
            return df.add(rad, _bmm(A1, _transpose(A2, (0, 2, 1)))), None

        rad, _ = jax.lax.scan(pair_body, rad0, (a_all, b_all, cc_all))

        # E[t, Qi, nfb*M] = rad @ Bj'[t, Qj, nfb*M]
        BjT = _transpose(_reshape(Bj_, (T, nfb, Qj, M)), (0, 2, 1, 3))
        E = _bmm(rad, _reshape(BjT, (T, Qj, nfb * M)))
        # out[t, fi, fj] = sum_{Qi, M} Bi[t, fi, Qi, M] E[t, Qi, fj, M]
        E = _reshape(E, (T, Qi, nfb, M))
        E = _reshape(_transpose(E, (0, 1, 3, 2)), (T, Qi * M, nfb))
        BiT = _reshape(Bi, (T, nfa, Qi, M))
        out = _bmm(_reshape(BiT, (T, nfa, Qi * M)), E)
        return jnp.stack([out.hi, out.lo])

    return jax.jit(fn)


def _col2(x, i):
    return df.DF64(x.hi[:, i], x.lo[:, i])


def _stack_prim_pairs(geom, npa: int, npb: int):
    """Stack the npa*npb primitive-pair (a, b, ca*cb) arrays to (P, T)."""
    ia = np.repeat(np.arange(npa), npb)
    ib = np.tile(np.arange(npb), npa)
    ea, eb = geom["exps_a"], geom["exps_b"]
    ca, cb = geom["coefs_a"], geom["coefs_b"]
    a_all = df.DF64(ea.hi[:, ia].T, ea.lo[:, ia].T)
    b_all = df.DF64(eb.hi[:, ib].T, eb.lo[:, ib].T)
    cc_all = df.mul(
        df.DF64(ca.hi[:, ia].T, ca.lo[:, ia].T),
        df.DF64(cb.hi[:, ib].T, cb.lo[:, ib].T),
    )
    return a_all, b_all, cc_all


def _r_powers(r, smax: int):
    outs = [df.const(1.0, r.hi.shape)]
    for _ in range(smax):
        outs.append(df.mul(outs[-1], r))
    return outs


def _outer_sl(P, I):
    """powers list (ns) x bessel list (nlam) -> (T, ns*nlam, NQ) DF64."""
    rows = []
    for p in P:
        for i in I:
            rows.append(df.mul(p, i))
    return df.DF64(
        jnp.stack([x.hi for x in rows], 1), jnp.stack([x.lo for x in rows], 1)
    )


@lru_cache(maxsize=None)
def _type1_kernel(la, npa, lb, npb, kch):
    """Jitted type-1 (local channel) batch kernel for one task class."""
    meta = _t1_pair_meta(la, lb)
    nfa, nfb = meta["nfa"], meta["nfb"]
    ns, nlam = meta["ns"], meta["nlam"]
    Q = ns * nlam
    R = len(meta["slot_out"])
    onehot = np.zeros((R, nfa * nfb), np.float32)
    onehot[np.arange(R), meta["slot_out"]] = 1.0
    Vt = np.ascontiguousarray(meta["V"].T)  # (K, R)
    V_hi = np.asarray(Vt, np.float32)
    V_lo = np.asarray(Vt - np.asarray(V_hi, np.float64), np.float32)

    def fn(geom):
        Ai, Aj, C = geom["coord_a"], geom["coord_b"], geom["coord_c"]
        Di = df.sub(Ai, C)
        Dj = df.sub(Aj, C)
        _, dmi = _safe_unit(Di)
        _, dmj = _safe_unit(Dj)
        di2 = df.mul(dmi, dmi)
        dj2 = df.mul(dmj, dmj)
        T = Ai.hi.shape[0]
        powsi = _pow_table(Di, la)
        powsj = _pow_table(Dj, lb)
        powDi = _gather_pow(powsi, meta["e_i"])  # (T, R)
        powDj = _gather_pow(powsj, meta["e_j"])
        powD = df.mul(powDi, powDj)

        out0 = df.DF64(
            jnp.zeros((T, nfa * nfb), jnp.float32),
            jnp.zeros((T, nfa * nfb), jnp.float32),
        )
        Vh = jnp.asarray(V_hi)
        Vl = jnp.asarray(V_lo)
        a_all, b_all, cc_all = _stack_prim_pairs(geom, npa, npb)

        def pair_body(out, x):
            a, b, cc = x  # (T,) DF64
            p = df.add(a, b)
            kvec = df.add(
                df.mul(df.DF64(a.hi[:, None], a.lo[:, None]), Di),
                df.mul(df.DF64(b.hi[:, None], b.lo[:, None]), Dj),
            )
            kvec = df.scale_pow2(kvec, 2.0)
            khat, kmag = _safe_unit(kvec)
            mono = _mono_vec(khat, meta["lam_max"])  # (T, K)

            # ang[t, r] = powD * sum_k mono V[k, r]
            def body(k, acc):
                mk = df.DF64(mono.hi[:, k, None], mono.lo[:, k, None])
                Vk = df.DF64(Vh[k][None], Vl[k][None])
                return df.add(acc, df.mul(mk, Vk))

            acc0 = df.DF64(
                jnp.zeros((T, R), jnp.float32), jnp.zeros((T, R), jnp.float32)
            )
            ang = jax.lax.fori_loop(0, meta["K"], body, acc0)
            ang = df.mul(ang, powD)

            r, wq = _radial_grid(p, kmag, geom["zmin"])
            base = _channel_u(r, wq, geom["ch_d"], geom["ch_z"], geom["ch_n"])
            expo = df.add(
                df.sub(
                    df.mul(_bcast(kmag, _NQUAD), r),
                    df.mul(_bcast(p, _NQUAD), df.mul(r, r)),
                ),
                df.neg(_bcast(df.add(df.mul(a, di2), df.mul(b, dj2)), _NQUAD)),
            )
            base = df.mul(base, df.exp(expo))
            base = df.mul(base, _bcast(cc, _NQUAD))
            I = ine_df64(meta["lam_max"], df.mul(_bcast(kmag, _NQUAD), r))
            P = _r_powers(r, ns - 1)
            A = _outer_sl(P, I)  # (T, Q, NQ)
            rad = _bmm(
                A, df.DF64(base.hi[:, :, None], base.lo[:, :, None])
            )  # (T, Q, 1)
            rad = df.DF64(rad.hi[:, :, 0], rad.lo[:, :, 0])
            # contrib[t, r_row] = ang * rad[slot_rad[row]]
            radg = df.DF64(
                jnp.take(rad.hi, meta["slot_rad"], axis=1),
                jnp.take(rad.lo, meta["slot_rad"], axis=1),
            )
            contrib = df.mul(ang, radg)  # (T, R)
            got = _onehot_bmm(
                df.DF64(contrib.hi[:, None, :], contrib.lo[:, None, :]), onehot
            )  # (T, 1, nfa*nfb)
            return df.add(out, df.DF64(got.hi[:, 0, :], got.lo[:, 0, :])), None

        out, _ = jax.lax.scan(pair_body, out0, (a_all, b_all, cc_all))
        o = _reshape(out, (T, nfa, nfb))
        return jnp.stack([o.hi, o.lo])

    return jax.jit(fn)


# ===================================================== derivative maps
@lru_cache(maxsize=None)
def _shift_maps(l: int):
    """Cartesian-component maps for d/dA via angular-momentum shifts.

    d/dA_d phi_(comp) = 2a * phi_(comp + e_d)  -  comp[d] * phi_(comp - e_d)
    (reference counterpart: the shifted-LI derivative kernels,
    /root/reference/jqc/backend/ecp/ecp_type1_ip.cu).
    Returns (plus_idx (3, nf), minus_idx (3, nf), minus_coef (3, nf));
    minus_idx = 0 with coef 0 when comp[d] == 0."""
    comps = cart_components(l)
    up = {c: i for i, c in enumerate(cart_components(l + 1))}
    dn = {c: i for i, c in enumerate(cart_components(l - 1))} if l > 0 else {}
    nf = len(comps)
    plus = np.zeros((3, nf), np.int64)
    minus = np.zeros((3, nf), np.int64)
    mcoef = np.zeros((3, nf))
    for fi, c in enumerate(comps):
        for d in range(3):
            e = [0, 0, 0]
            e[d] = 1
            plus[d, fi] = up[(c[0] + e[0], c[1] + e[1], c[2] + e[2])]
            if c[d] > 0:
                minus[d, fi] = dn[(c[0] - e[0], c[1] - e[1], c[2] - e[2])]
                mcoef[d, fi] = c[d]
    return plus, minus, mcoef


@lru_cache(maxsize=None)
def _shift2_maps(l: int):
    """Second-derivative composition maps: d^2/dA_d dA_e via two shifts.

    D_e(D_d phi_c) = 4a^2 phi_{c+d+e}
                   - 2a (c_e + delta_de) phi_{c+d-e}
                   - 2a c_d phi_{c-d+e}
                   + c_d (c_e - delta_de) phi_{c-d-e}
    (terms with a negative component are absent).  Returns, for each
    (d, e): a list over fi of [(level, idx, coef)] where level indexes
    the kernel evaluation family: 2 -> l+2 with 4a^2-scaled coefs,
    1 -> l with 2a-scaled coefs, 0 -> l-2 with plain coefs."""
    comps = cart_components(l)
    # level mapping: kernel family 2 -> l+2, 1 -> l, 0 -> l-2
    pos2 = {c: i for i, c in enumerate(cart_components(l + 2))}
    pos1 = {c: i for i, c in enumerate(cart_components(l))}
    pos0 = (
        {c: i for i, c in enumerate(cart_components(l - 2))} if l >= 2 else {}
    )
    out = {}
    for d in range(3):
        for e in range(3):
            ed = np.eye(3, dtype=int)[d]
            ee = np.eye(3, dtype=int)[e]
            rows = []
            for fi, c in enumerate(comps):
                c = np.array(c, int)
                terms = []
                terms.append((2, pos2[tuple(c + ed + ee)], 1.0))
                t = c + ed - ee
                if t.min() >= 0:
                    terms.append((1, pos1[tuple(t)], -(c[e] + (1.0 if d == e else 0.0))))
                t = c - ed + ee
                if t.min() >= 0 and c[d] > 0:
                    terms.append((1, pos1[tuple(t)], -float(c[d])))
                t = c - ed - ee
                if t.min() >= 0 and c[d] > 0:
                    coef = c[d] * (c[e] - (1.0 if d == e else 0.0))
                    if coef != 0.0:
                        terms.append((0, pos0[tuple(t)], float(coef)))
                rows.append(terms)
            out[(d, e)] = rows
    return out


# =============================================================== engine
class ECPEngine:
    """Batched TPU evaluation of the full ECP matrix over a BasisLayout.

    Reference counterpart: get_ecp host driver
    (/root/reference/jqc/backend/ecp.py:1371-1501)."""

    def __init__(self, layout: BasisLayout, chunk: int = 128):
        self.layout = layout
        self.mol = layout.mol
        self.chunk = chunk
        self.classes = build_shell_classes(layout)
        self._centers = self._collect_channels()

    def _collect_channels(self):
        """[(C coord, l, powers, exps, coefs, atom_idx)] per (atom, channel)."""
        mol = self.mol
        out = []
        if not getattr(mol, "ecp", None):
            return out
        for ia in range(mol.natm):
            data = mol.ecp.get(mol.atom_symbols[ia].capitalize())
            if data is None:
                continue
            C = mol.coords[ia]
            for ch in data.channels:
                out.append((C, ch.l, ch.powers, ch.exps, ch.coefs, ia))
        return out

    # ------------------------------------------------------------ tasks
    def _tasks(self):
        """Yield (class_i, class_j, channel, [(si, sj, icen), ...]) blocks."""
        classes = self.classes
        for ci in range(len(classes)):
            for cj in range(ci + 1):
                c1, c2 = classes[ci], classes[cj]
                for icen, (C, l, powers, exps, coefs, _ia) in enumerate(
                    self._centers
                ):
                    tasks = []
                    zmin = float(exps.min())
                    for si in range(c1.nshell):
                        if c1.shell_ids[si] < 0:
                            continue
                        dmi = np.linalg.norm(c1.coords[si] - C)
                        ai = c1.exps[si][c1.coefs[si] != 0]
                        a = float(ai.min()) if len(ai) else 1.0
                        sj_max = si + 1 if ci == cj else c2.nshell
                        for sj in range(sj_max):
                            if c2.shell_ids[sj] < 0:
                                continue
                            dmj = np.linalg.norm(c2.coords[sj] - C)
                            bj = c2.exps[sj][c2.coefs[sj] != 0]
                            b = float(bj.min()) if len(bj) else 1.0
                            # peak-integrand screening (collinear upper
                            # bound; see module docstring)
                            pt = a + b + zmin
                            rh = (a * dmi + b * dmj) / pt
                            val = (
                                a * (rh - dmi) ** 2
                                + b * (rh - dmj) ** 2
                                + zmin * rh * rh
                            )
                            if val < _SCREEN_EXP:
                                tasks.append((si, sj))
                    if tasks:
                        yield ci, cj, icen, tasks

    def _geom(self, c1: ShellClass, c2: ShellClass, cen, tasks, kch,
              scale_a=False, scale_b=False):
        """Pack a padded task chunk into DF64 device arrays.

        scale_a/scale_b: multiply that side's contraction coefficients by
        2*exponent (the raising term of the d/dA shift identity)."""
        C, l, powers, exps, coefs, _ia = cen
        B = len(tasks)
        si = np.array([t[0] for t in tasks], np.int32)
        sj = np.array([t[1] for t in tasks], np.int32)
        d = np.zeros((B, kch))
        z = np.ones((B, kch))
        n1h = np.zeros((B, kch, 3), np.float32)
        d[:, : len(coefs)] = coefs
        z[:, : len(exps)] = exps
        for k, n in enumerate(powers):
            n1h[:, k, int(n)] = 1.0
        ca = c1.coefs[si]
        cb = c2.coefs[sj]
        if scale_a == 1:
            ca = 2.0 * c1.exps[si] * ca
        elif scale_a == 2:
            ca = 4.0 * c1.exps[si] ** 2 * ca
        if scale_b == 1:
            cb = 2.0 * c2.exps[sj] * cb
        elif scale_b == 2:
            cb = 4.0 * c2.exps[sj] ** 2 * cb
        geom = dict(
            coord_a=df.from_f64(c1.coords[si]),
            coord_b=df.from_f64(c2.coords[sj]),
            coord_c=df.from_f64(np.broadcast_to(C, (B, 3)).copy()),
            exps_a=df.from_f64(c1.exps[si]),
            exps_b=df.from_f64(c2.exps[sj]),
            coefs_a=df.from_f64(ca),
            coefs_b=df.from_f64(cb),
            ch_d=df.from_f64(d),
            ch_z=df.from_f64(z),
            ch_n=jnp.asarray(n1h),
            zmin=jnp.full((B,), float(exps.min()), jnp.float32),
        )
        return geom, si, sj

    @staticmethod
    def _run_kernel(geom, la, npa, lb, npb, l, kch):
        """Dispatch the type1/type2 kernel; returns f64 (B, nfa, nfb)."""
        if l < 0:
            fn = _type1_kernel(la, npa, lb, npb, kch)
        else:
            fn = _type2_kernel(la, npa, lb, npb, l, kch)
        hi_lo = np.asarray(fn(geom), np.float64)
        return hi_lo[0] + hi_lo[1]

    def _deriv_a(self, c1, c2, cen, chunk, kch):
        """d/dA blocks (3, B, nfa, nfb): bra-center derivative via the
        angular-momentum shift identity (see _shift_maps)."""
        l, la, lb = cen[1], c1.l, c2.l
        geom_p, _, _ = self._geom(c1, c2, cen, chunk, kch, scale_a=True)
        Vp = self._run_kernel(geom_p, la + 1, c1.nprim, lb, c2.nprim, l, kch)
        plus, minus, mcoef = _shift_maps(la)
        out = Vp[:, plus, :].transpose(1, 0, 2, 3)  # (3, B, nfa, nfb)
        if la > 0:
            geom_m, _, _ = self._geom(c1, c2, cen, chunk, kch)
            Vm = self._run_kernel(
                geom_m, la - 1, c1.nprim, lb, c2.nprim, l, kch
            )
            out = out - mcoef[:, None, :, None] * Vm[:, minus, :].transpose(
                1, 0, 2, 3
            )
        return out

    def _deriv2_aa(self, c1, c2, cen, chunk, kch):
        """d^2/dA_d dA_e blocks (3, 3, B, nfa, nfb) -- 'ipipv'."""
        l, la, lb = cen[1], c1.l, c2.l
        Vs = {}
        geom2, _, _ = self._geom(c1, c2, cen, chunk, kch, scale_a=2)
        Vs[2] = self._run_kernel(geom2, la + 2, c1.nprim, lb, c2.nprim, l, kch)
        geom1, _, _ = self._geom(c1, c2, cen, chunk, kch, scale_a=1)
        Vs[1] = self._run_kernel(geom1, la, c1.nprim, lb, c2.nprim, l, kch)
        if la >= 2:
            geom0, _, _ = self._geom(c1, c2, cen, chunk, kch)
            Vs[0] = self._run_kernel(
                geom0, la - 2, c1.nprim, lb, c2.nprim, l, kch
            )
        maps = _shift2_maps(la)
        nfa = len(cart_components(la))
        B, nfb = Vs[2].shape[0], Vs[2].shape[2]
        out = np.zeros((3, 3, B, nfa, nfb))
        for (d, e), rows in maps.items():
            for fi, terms in enumerate(rows):
                for (lv, idx, coef) in terms:
                    out[d, e, :, fi, :] += coef * Vs[lv][:, idx, :]
        return out

    def _deriv_ab(self, c1, c2, cen, chunk, kch):
        """d^2/dA_d dB_e blocks (3, 3, B, nfa, nfb) -- 'ipvip'."""
        l, la, lb = cen[1], c1.l, c2.l
        plus_a, minus_a, mca = _shift_maps(la)
        plus_b, minus_b, mcb = _shift_maps(lb)
        V = {}
        for sa, dla in ((1, 1), (0, -1)):
            if la + dla < 0 and dla < 0:
                continue
            if dla < 0 and la == 0:
                continue
            for sb, dlb in ((1, 1), (0, -1)):
                if dlb < 0 and lb == 0:
                    continue
                geom, _, _ = self._geom(
                    c1, c2, cen, chunk, kch, scale_a=sa, scale_b=sb
                )
                V[(dla, dlb)] = self._run_kernel(
                    geom, la + dla, c1.nprim, lb + dlb, c2.nprim, l, kch
                )
        nfa = len(cart_components(la))
        nfb = len(cart_components(lb))
        B = V[(1, 1)].shape[0]
        out = np.zeros((3, 3, B, nfa, nfb))
        for d in range(3):
            for e in range(3):
                blk = V[(1, 1)][:, plus_a[d], :][:, :, plus_b[e]]
                if lb > 0:
                    blk = blk - mcb[e][None, None, :] * V[(1, -1)][
                        :, plus_a[d], :
                    ][:, :, minus_b[e]]
                if la > 0:
                    blk = blk - mca[d][None, :, None] * V[(-1, 1)][
                        :, minus_a[d], :
                    ][:, :, plus_b[e]]
                    if lb > 0:
                        blk = blk + (
                            mca[d][None, :, None] * mcb[e][None, None, :]
                        ) * V[(-1, -1)][:, minus_a[d], :][:, :, minus_b[e]]
                out[d, e] = blk
        return out

    def build_ipip(self, kind: str = "ipipv") -> np.ndarray:
        """Second-derivative ECP matrices per ECP atom: (necp, 9, nao, nao).

        kind='ipipv': <d^2/dA_d dA_e phi_i | U_k | phi_j> (both on bra);
        kind='ipvip': <d/dA_d phi_i | U_k | d/dB_e phi_j>.
        Rows are flattened (d, e) -> 3*d + e.  Reference counterpart:
        get_ecp_ipip (/root/reference/jqc/backend/ecp.py:1141)."""
        lay = self.layout
        nao = lay.nao_int
        ecp_atoms = sorted({c[5] for c in self._centers})
        slot = {ia: k for k, ia in enumerate(ecp_atoms)}
        out = np.zeros((len(ecp_atoms), 9, nao, nao))
        for ci, cj, icen, tasks in self._tasks():
            c1, c2 = self.classes[ci], self.classes[cj]
            cen = self._centers[icen]
            kch = len(cen[3])
            k = slot[cen[5]]
            B = min(self.chunk, len(tasks))
            for s in range(0, len(tasks), B):
                chunk = tasks[s : s + B]
                pad = B - len(chunk)
                chunk = chunk + [chunk[-1]] * pad
                si = np.array([t[0] for t in chunk], np.int32)
                sj = np.array([t[1] for t in chunk], np.int32)
                if kind == "ipipv":
                    dd = self._deriv2_aa(c1, c2, cen, chunk, kch)
                    swapped = [(int(b), int(a)) for a, b in chunk]
                    # mirror (j, i) entry: <dd phi_j|U|phi_i> -- the
                    # swapped evaluation already has rows = j-components
                    dd_swap = self._deriv2_aa(c2, c1, cen, swapped, kch)
                elif kind == "ipvip":
                    dd = self._deriv_ab(c1, c2, cen, chunk, kch)
                    # mirrored pair (j, i): <di phi_j | U | de phi_i>
                    dd_swap = dd.transpose(1, 0, 2, 4, 3)
                else:
                    raise ValueError(kind)
                n = len(chunk) - pad
                nfa, nfb = dd.shape[3], dd.shape[4]
                for t in range(n):
                    a0, b0 = int(c1.ao[si[t]]), int(c2.ao[sj[t]])
                    out[k, :, a0 : a0 + nfa, b0 : b0 + nfb] += dd[
                        :, :, t
                    ].reshape(9, nfa, nfb)
                    if not (ci == cj and si[t] == sj[t]):
                        out[k, :, b0 : b0 + nfb, a0 : a0 + nfa] += dd_swap[
                            :, :, t
                        ].reshape(9, nfb, nfa)
        mol_list = []
        for kk in range(len(ecp_atoms)):
            mol_list.append(
                np.stack([lay.mat_to_mol(out[kk, d]) for d in range(9)])
            )
        if not mol_list:
            nmo = lay.mat_to_mol(np.zeros((nao, nao))).shape[0]
            return np.zeros((0, 9, nmo, nmo))
        return np.stack(mol_list)

    # ------------------------------------------------------------- matrix
    def build(self) -> np.ndarray:
        """Full ECP matrix in the molecular AO basis."""
        lay = self.layout
        nao = lay.nao_int
        V = np.zeros((nao, nao))
        for ci, cj, icen, tasks in self._tasks():
            c1, c2 = self.classes[ci], self.classes[cj]
            cen = self._centers[icen]
            l = cen[1]
            kch = len(cen[3])
            B = min(self.chunk, len(tasks))
            for s in range(0, len(tasks), B):
                chunk = tasks[s : s + B]
                pad = B - len(chunk)
                chunk = chunk + [chunk[-1]] * pad  # padded rows dropped below
                geom, si, sj = self._geom(c1, c2, cen, chunk, kch)
                if l < 0:
                    fn = _type1_kernel(c1.l, c1.nprim, c2.l, c2.nprim, kch)
                else:
                    fn = _type2_kernel(c1.l, c1.nprim, c2.l, c2.nprim, l, kch)
                hi_lo = np.asarray(fn(geom), np.float64)
                blocks = hi_lo[0] + hi_lo[1]  # (B, nfa, nfb)
                nfa = blocks.shape[1]
                nfb = blocks.shape[2]
                for t in range(len(chunk) - pad):
                    a0 = int(c1.ao[si[t]])
                    b0 = int(c2.ao[sj[t]])
                    blk = blocks[t]
                    V[a0 : a0 + nfa, b0 : b0 + nfb] += blk
                    same_shell = (ci == cj) and (si[t] == sj[t])
                    if not same_shell:
                        V[b0 : b0 + nfb, a0 : a0 + nfa] += blk.T
        return lay.mat_to_mol(V)

    # --------------------------------------------------------- derivatives
    def _deriv_chunks(self):
        """Yield per-chunk derivative data for gradient/ip assembly.

        Yields (c1, c2, same_class, atomC, si, sj, dA, dB) where dA/dB are
        (3, B, nfa, nfb) derivatives w.r.t. the bra/ket shell centers."""
        for ci, cj, icen, tasks in self._tasks():
            c1, c2 = self.classes[ci], self.classes[cj]
            cen = self._centers[icen]
            kch = len(cen[3])
            B = min(self.chunk, len(tasks))
            for s in range(0, len(tasks), B):
                chunk = tasks[s : s + B]
                pad = B - len(chunk)
                chunk = chunk + [chunk[-1]] * pad
                si = np.array([t[0] for t in chunk], np.int32)
                sj = np.array([t[1] for t in chunk], np.int32)
                dA = self._deriv_a(c1, c2, cen, chunk, kch)
                # ket derivative by operator symmetry: swap sides, transpose
                swapped = [(int(b), int(a)) for a, b in chunk]
                dB = self._deriv_a(c2, c1, cen, swapped, kch).transpose(
                    0, 1, 3, 2
                )
                n = len(chunk) - pad
                yield c1, c2, ci == cj, cen[5], si[:n], sj[:n], dA[:, :n], dB[:, :n]

    def build_ip(self) -> np.ndarray:
        """Bra-derivative ECP matrices per ECP atom: (necp, 3, nao, nao).

        ip[k, d] = <d/dA_d phi_i | U_k | phi_j> (derivative on the bra
        shell center A).  Reference counterpart: get_ecp_ip
        (/root/reference/jqc/backend/ecp.py:953, ECP_ATOM_ID slots)."""
        lay = self.layout
        nao = lay.nao_int
        ecp_atoms = sorted({c[5] for c in self._centers})
        slot = {ia: k for k, ia in enumerate(ecp_atoms)}
        out = np.zeros((len(ecp_atoms), 3, nao, nao))
        for c1, c2, same_class, atomC, si, sj, dA, dB in self._deriv_chunks():
            k = slot[atomC]
            for t in range(len(si)):
                a0, b0 = int(c1.ao[si[t]]), int(c2.ao[sj[t]])
                nfa, nfb = dA.shape[2], dA.shape[3]
                out[k, :, a0 : a0 + nfa, b0 : b0 + nfb] += dA[:, t]
                if not (same_class and si[t] == sj[t]):
                    # mirrored pair (j, i): its bra derivative is dB^T
                    out[k, :, b0 : b0 + nfb, a0 : a0 + nfa] += dB[
                        :, t
                    ].transpose(0, 2, 1)
        mol_mats = np.stack(
            [
                np.stack([lay.mat_to_mol(out[k, d]) for d in range(3)])
                for k in range(len(ecp_atoms))
            ]
        ) if ecp_atoms else out.reshape(0, 3, *lay.mat_to_mol(np.zeros((nao, nao))).shape)
        return mol_mats

    def gradient(self, dm_mol) -> np.ndarray:
        """Nuclear gradient of E_ecp = sum_ij dm_ij V_ij: (natm, 3).

        dm must be symmetric (an SCF density).  Uses translation
        invariance dV/dC = -(dV/dA + dV/dB) for the ECP-center term."""
        lay = self.layout
        dm_int = lay.dm_to_internal(np.asarray(dm_mol, np.float64))
        shells = self.mol.shells
        grad = np.zeros((self.mol.natm, 3))
        for c1, c2, same_class, atomC, si, sj, dA, dB in self._deriv_chunks():
            for t in range(len(si)):
                a0, b0 = int(c1.ao[si[t]]), int(c2.ao[sj[t]])
                nfa, nfb = dA.shape[2], dA.shape[3]
                blk_dm = dm_int[a0 : a0 + nfa, b0 : b0 + nfb]
                w = 1.0 if (same_class and si[t] == sj[t]) else 2.0
                ia = shells[int(c1.shell_ids[si[t]])].atom_idx
                ib = shells[int(c2.shell_ids[sj[t]])].atom_idx
                ga = w * np.einsum("dij,ij->d", dA[:, t], blk_dm)
                gb = w * np.einsum("dij,ij->d", dB[:, t], blk_dm)
                grad[ia] += ga
                grad[ib] += gb
                grad[atomC] -= ga + gb
        return grad


__all__ = ["ECPEngine"]
