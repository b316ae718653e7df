"""M06-family functional tests: exact structural identities + potentials.

The defining papers build in two exact UEG constraints that double as
transcription checks on the parameter data (they caught a real e-02/e-01
slip in round 5):
 - per correlation channel: c0 + d0 = 1 (at the UEG, x = z = 0, the
   channel factor must reduce to 1 so the total correlation is the bare
   PW92 partition);
 - exchange: a0 + dx0 = 1 - hyb (the UEG exchange must sum with the HF
   fraction to the full LSDA value).
"""

import os

import numpy as np
import pytest

from joltqc_tpu.dft.xc_data import M06_FUNCTIONALS


@pytest.mark.parametrize("name", sorted(M06_FUNCTIONALS))
def test_ueg_structural_identities(name):
    d = M06_FUNCTIONALS[name]
    assert abs(d["css"][0] + d["dss"][0] - 1.0) < 1e-9
    assert abs(d["cos"][0] + d["dos"][0] - 1.0) < 1e-9
    assert abs(d["a"][0] + d["dx"][0] - (1.0 - d["hyb"])) < 1e-9


def _m06_e(rho, sig, tau):
    """Evaluate the m06 candidate e_xc through the machinery directly
    (the parse_xc alias is anchor-gated; the MACHINERY is what these
    tests pin)."""
    import jax
    import jax.numpy as jnp

    from joltqc_tpu.dft.xc import _make_m06

    comps = _make_m06(M06_FUNCTIONALS["m06"])
    with jax.enable_x64(True):
        rho = jnp.maximum(jnp.asarray(rho, jnp.float64), 1e-14)
        sig = jnp.maximum(jnp.asarray(sig, jnp.float64), 1e-28)
        tau = jnp.maximum(jnp.asarray(tau, jnp.float64), 1e-20)
        return np.asarray(sum(c * f(rho, sig, tau) for c, f in comps))


def test_m06_ueg_limit_total():
    """At the UEG (sigma->0, tau=tau_unif) the M06 e_xc must equal
    (1-hyb)*e_x^LSDA + e_c^PW92 exactly (both constraints together)."""
    import jax

    from joltqc_tpu.dft import xc as m

    rho = np.array([0.3, 1.0, 4.0])
    tau_u = 2.0 * (0.3 * (6 * np.pi**2) ** (2 / 3)) * (rho / 2) ** (5 / 3)
    sig = np.full_like(rho, 1e-28)
    e = _m06_e(rho, sig, tau_u)
    with jax.enable_x64(True):
        ex = (1.0 - 0.27) * np.asarray(m._ex_slater(rho, sig, tau_u))
        ec = rho * np.asarray(m._pw92_eps(rho))
    np.testing.assert_allclose(e, ex + ec, rtol=1e-6)


def test_m06_potential_finite_difference():
    """Autodiff d(e)/d(rho,sigma,tau) vs central differences through the
    machinery (same grad path eval_xc uses)."""
    import jax
    import jax.numpy as jnp

    from joltqc_tpu.dft.xc import _make_m06

    comps = _make_m06(M06_FUNCTIONALS["m06"])

    def etot(r, s, t):
        return sum(c * f(r, s, t) for c, f in comps)[0]

    rho = np.array([0.8])
    sig = np.array([0.31])
    tau = np.array([0.9])
    with jax.enable_x64(True):
        args = tuple(jnp.asarray(x, jnp.float64) for x in (rho, sig, tau))
        grads = jax.grad(etot, argnums=(0, 1, 2))(*args)
        h = 1e-6
        for i, g in enumerate(grads):
            pa = [a.copy() for a in (rho, sig, tau)]
            pa[i] = pa[i] + h
            ma = [a.copy() for a in (rho, sig, tau)]
            ma[i] = ma[i] - h
            fd = (
                np.asarray(etot(*(jnp.asarray(x) for x in pa)))
                - np.asarray(etot(*(jnp.asarray(x) for x in ma)))
            ) / (2 * h)
            np.testing.assert_allclose(np.asarray(g)[0], fd, rtol=2e-5)


def test_unverified_members_gated():
    from joltqc_tpu.dft.xc import parse_xc

    if os.environ.get("JQC_ALLOW_UNVERIFIED_XC"):
        pytest.skip("gate disabled via env")
    # every M06-family member is anchor-gated until a source-verified
    # parameter set exists (xc_data.py provenance notes)
    for name in ("m06", "m06-l", "m06-2x"):
        with pytest.raises(NotImplementedError):
            parse_xc(name)
