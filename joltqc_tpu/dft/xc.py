"""Exchange-correlation functionals in JAX with autodiff potentials.

The reference delegates XC evaluation to libxc through GPU4PySCF
(``ni.eval_xc_eff``, /root/reference/jqc/pyscf/rks.py:341); no libxc
exists in this environment, so the functionals are implemented directly:
energy densities e(rho, sigma) as jax functions, potentials
(vrho = de/drho, vsigma = de/dsigma) via ``jax.grad`` -- one definition,
machine-exact derivatives, no hand-coded vxc.

Precision: XC is evaluated on the HOST CPU backend in float64 inside a
``jax.experimental.enable_x64`` scope (the rho vector is O(ngrid), tiny
next to the Fock build, and TPU f32 would inject ~1e-5 Ha noise into
total energies).  The TPU does the heavy lifting on either side of this
call (rho evaluation and vxc-matrix contraction, dft/numint.py).

Implemented (restricted/closed-shell, matching the reference's
RHF/RKS-only scope): Slater X; VWN5 & VWN3(RPA) C; PW92 C; PBE X/C;
B88 X; LYP C (Johnson-Gill-Pople form); composites SVWN/PBE/BLYP/
B3LYP/B3LYP5/PBE0.  All formulas validated in tests/test_xc.py by exact
limits, finite-difference potentials, and uniform-gas identities.
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np

import jax
import jax.numpy as jnp

# ------------------------------------------------------------- constants
_CX = 0.75 * (3.0 / np.pi) ** (1.0 / 3.0)  # Slater exchange constant
_CX_SPIN = 0.75 * (6.0 / np.pi) ** (1.0 / 3.0)  # per-spin variant
_CF = 0.3 * (3.0 * np.pi**2) ** (2.0 / 3.0)  # Thomas-Fermi kinetic const

_RHO_FLOOR = 1e-14


def _rs(rho):
    return (3.0 / (4.0 * np.pi * rho)) ** (1.0 / 3.0)


# ----------------------------------------------------------- LDA pieces
def _ex_slater(rho, sigma):
    return -_CX * rho ** (4.0 / 3.0)


def _vwn_eps(rho, A, b, c, x0):
    """VWN correlation energy per particle (paramagnetic channel)."""
    x = jnp.sqrt(_rs(rho))
    X = x * x + b * x + c
    X0 = x0 * x0 + b * x0 + c
    Q = np.sqrt(4.0 * c - b * b)
    atn = jnp.arctan(Q / (2.0 * x + b))
    return A * (
        jnp.log(x * x / X)
        + (2.0 * b / Q) * atn
        - (b * x0 / X0)
        * (jnp.log((x - x0) ** 2 / X) + (2.0 * (b + 2.0 * x0) / Q) * atn)
    )


def _ec_vwn5(rho, sigma):
    return rho * _vwn_eps(rho, 0.0310907, 3.72744, 12.9352, -0.10498)


def _ec_vwn3(rho, sigma):
    # VWN III (RPA fit) -- the parametrization inside Gaussian-style B3LYP
    return rho * _vwn_eps(rho, 0.0310907, 13.0720, 42.7198, -0.409286)


def _pw92_eps(rho):
    """PW92 correlation energy per particle (zeta = 0)."""
    A, a1 = 0.031091, 0.21370
    b1, b2, b3, b4 = 7.5957, 3.5876, 1.6382, 0.49294
    rs = _rs(rho)
    srs = jnp.sqrt(rs)
    den = 2.0 * A * (b1 * srs + b2 * rs + b3 * rs * srs + b4 * rs * rs)
    return -2.0 * A * (1.0 + a1 * rs) * jnp.log1p(1.0 / den)


def _ec_pw92(rho, sigma):
    return rho * _pw92_eps(rho)


# ----------------------------------------------------------- GGA pieces
def _ex_pbe(rho, sigma):
    kappa, mu = 0.804, 0.2195149727645171
    kf = (3.0 * np.pi**2 * rho) ** (1.0 / 3.0)
    s2 = sigma / (4.0 * kf**2 * rho**2)
    fx = 1.0 + kappa - kappa / (1.0 + mu * s2 / kappa)
    return _ex_slater(rho, sigma) * fx


def _ec_pbe(rho, sigma):
    gamma = (1.0 - np.log(2.0)) / np.pi**2
    beta = 0.06672455060314922
    eps = _pw92_eps(rho)
    kf = (3.0 * np.pi**2 * rho) ** (1.0 / 3.0)
    ks = jnp.sqrt(4.0 * kf / np.pi)
    t2 = sigma / (2.0 * ks * rho) ** 2
    expo = jnp.exp(-eps / gamma)
    A = (beta / gamma) / (expo - 1.0 + 1e-30)
    num = 1.0 + A * t2
    den = 1.0 + A * t2 + (A * t2) ** 2
    H = gamma * jnp.log1p((beta / gamma) * t2 * num / den)
    return rho * (eps + H)


def _ex_b88_spin(rs_, ss_):
    """B88 exchange for ONE spin channel (rho_s, sigma_ss)."""
    beta = 0.0042
    r43 = rs_ ** (4.0 / 3.0)
    x = jnp.sqrt(ss_) / r43
    return -_CX_SPIN * r43 - beta * r43 * x * x / (
        1.0 + 6.0 * beta * x * jnp.arcsinh(x)
    )


def _ex_b88(rho, sigma):
    # closed shell: both spins rho/2, sigma_ss = sigma/4
    return 2.0 * _ex_b88_spin(rho / 2.0, sigma / 4.0)


def _ec_lyp_spin(ra, rb, saa, sab, sbb):
    """LYP correlation, Johnson-Gill-Pople form (general spin)."""
    a, b, c, d = 0.04918, 0.132, 0.2533, 0.349
    rho = ra + rb
    r13 = rho ** (-1.0 / 3.0)
    denom = 1.0 + d * r13
    omega = jnp.exp(-c * r13) * rho ** (-11.0 / 3.0) / denom
    delta = c * r13 + d * r13 / denom
    sig = saa + 2.0 * sab + sbb
    G = ra * rb * (
        2.0 ** (11.0 / 3.0) * _CF * (ra ** (8.0 / 3.0) + rb ** (8.0 / 3.0))
        + (47.0 / 18.0 - 7.0 * delta / 18.0) * sig
        - (2.5 - delta / 18.0) * (saa + sbb)
        - ((delta - 11.0) / 9.0) * ((ra / rho) * saa + (rb / rho) * sbb)
    ) - (2.0 / 3.0) * rho**2 * sig + (
        (2.0 / 3.0) * rho**2 - ra**2
    ) * sbb + ((2.0 / 3.0) * rho**2 - rb**2) * saa
    return -4.0 * a * ra * rb / (rho * denom) - a * b * omega * G


def _ec_lyp(rho, sigma):
    return _ec_lyp_spin(rho / 2.0, rho / 2.0, sigma / 4.0, sigma / 4.0, sigma / 4.0)


# --------------------------------------------------------------- registry
# name -> (family, [(coef, component_fn), ...], hyb)
_COMPONENTS = {
    "slater": ("lda", [(1.0, _ex_slater)], 0.0),
    "vwn": ("lda", [(1.0, _ec_vwn5)], 0.0),
    "vwn5": ("lda", [(1.0, _ec_vwn5)], 0.0),
    "vwn3": ("lda", [(1.0, _ec_vwn3)], 0.0),
    "pw92": ("lda", [(1.0, _ec_pw92)], 0.0),
    "pbe_x": ("gga", [(1.0, _ex_pbe)], 0.0),
    "pbe_c": ("gga", [(1.0, _ec_pbe)], 0.0),
    "b88": ("gga", [(1.0, _ex_b88)], 0.0),
    "lyp": ("gga", [(1.0, _ec_lyp)], 0.0),
}

_ALIASES = {
    "lda": ("lda", [(1.0, _ex_slater), (1.0, _ec_vwn5)], 0.0),
    "svwn": ("lda", [(1.0, _ex_slater), (1.0, _ec_vwn5)], 0.0),
    "lda,vwn": ("lda", [(1.0, _ex_slater), (1.0, _ec_vwn5)], 0.0),
    "pbe": ("gga", [(1.0, _ex_pbe), (1.0, _ec_pbe)], 0.0),
    "pbe,pbe": ("gga", [(1.0, _ex_pbe), (1.0, _ec_pbe)], 0.0),
    "blyp": ("gga", [(1.0, _ex_b88), (1.0, _ec_lyp)], 0.0),
    "pbe0": ("gga", [(0.75, _ex_pbe), (1.0, _ec_pbe)], 0.25),
    # B3LYP (libxc convention: VWN-RPA in the 0.19 LDA-correlation slot)
    "b3lyp": (
        "gga",
        [(0.08, _ex_slater), (0.72, _ex_b88), (0.19, _ec_vwn3), (0.81, _ec_lyp)],
        0.20,
    ),
    "b3lyp5": (
        "gga",
        [(0.08, _ex_slater), (0.72, _ex_b88), (0.19, _ec_vwn5), (0.81, _ec_lyp)],
        0.20,
    ),
}


def parse_xc(xc_code: str):
    """Return (family, components, hyb) for a functional code."""
    key = xc_code.strip().lower()
    if key in _ALIASES:
        return _ALIASES[key]
    if key in _COMPONENTS:
        return _COMPONENTS[key]
    if "," in key:  # "x_part,c_part"
        xk, ck = (p.strip() for p in key.split(",", 1))
        fam, comps, hyb = "lda", [], 0.0
        for part in (xk, ck):
            if not part:
                continue
            f, cl, h = parse_xc(part)
            comps += cl
            hyb += h
            if f == "gga":
                fam = "gga"
        return fam, comps, hyb
    raise NotImplementedError(f"XC functional '{xc_code}' not implemented")


def is_gga(xc_code: str) -> bool:
    return parse_xc(xc_code)[0] == "gga"


def hybrid_coeff(xc_code: str) -> float:
    return parse_xc(xc_code)[2]


# ----------------------------------------------------------- evaluation
@lru_cache(maxsize=None)
def _xc_fn(xc_code: str):
    fam, comps, _ = parse_xc(xc_code)

    def e_density(rho, sigma):
        rho = jnp.maximum(rho, _RHO_FLOOR)
        sigma = jnp.maximum(sigma, 1e-28)
        return sum(c * f(rho, sigma) for c, f in comps)

    def both(rho, sigma):
        e = e_density(rho, sigma)
        vr, vs = jax.grad(lambda r, s: jnp.sum(e_density(r, s)), argnums=(0, 1))(
            rho, sigma
        )
        return e, vr, vs

    return jax.jit(both, backend="cpu")


def eval_xc(xc_code: str, rho, sigma=None):
    """Evaluate e_xc (per volume), vrho, vsigma at grid points.

    rho, sigma: numpy float64 (N,).  Runs in float64 on the host CPU
    backend.  Points below the density floor contribute exactly zero.
    """
    rho = np.asarray(rho, np.float64)
    if sigma is None:
        sigma = np.zeros_like(rho)
    sigma = np.asarray(sigma, np.float64)
    with jax.enable_x64(True):
        e, vr, vs = _xc_fn(xc_code)(jnp.asarray(rho), jnp.asarray(sigma))
        e, vr, vs = (np.array(x, np.float64) for x in (e, vr, vs))
    mask = rho <= _RHO_FLOOR
    e[mask] = 0.0
    vr[mask] = 0.0
    vs[mask] = 0.0
    return e, vr, vs


__all__ = ["eval_xc", "parse_xc", "is_gga", "hybrid_coeff"]
