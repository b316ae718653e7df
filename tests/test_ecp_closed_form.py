"""ECP integrals vs EXACT closed-form values (external cross-anchor).

VERDICT round-1 item 9: the adaptive-quadrature oracle (mol/ecp_np.py)
was the only truth for the ECP engine -- a shared convention error would
pass both sides.  These tests anchor the conventions on independent
closed-form mathematics (no quadrature, no shared code paths):

 - type1 (local channel) with U(r) = c e^{-z r^2}  (power n=2): the
   matrix element over Gaussians is a THREE-GAUSSIAN product integral
   with an elementary closed form.
 - type1 with U(r) = c r^{-1} e^{-z r^2}  (power n=1): closed form via
   the Boys function F0 (Coulomb integral of a Gaussian charge).
 - type2 (semi-local, l=0 projector) with n=2 over s-shells: the
   Bessel-expansion radial integral reduces to differences of Gaussians
   of cosh arguments -> an elementary erf-free closed form.

The same anchors are checked against BOTH the numpy oracle and the TPU
engine (reference counterpart of this role: mol.intor('ECPscalar') in
/root/reference/jqc/pyscf/tests/test_ecp.py:108).
"""

import numpy as np
from scipy.special import erf

from joltqc_tpu.mol import Molecule
from joltqc_tpu.mol.ecp import ECPChannel
from joltqc_tpu.mol.ecp_np import type1_cart_np, type2_cart_np
from joltqc_tpu.mol.molecule import Shell

A = np.array([0.3, -0.2, 0.5])
B = np.array([-0.4, 0.1, -0.6])
C = np.array([0.15, 0.55, -0.2])


def _s_shell(coord, a):
    return Shell(0, np.array([a]), np.array([1.0]), np.asarray(coord, float), 0)


def _p_shell(coord, a):
    return Shell(1, np.array([a]), np.array([1.0]), np.asarray(coord, float), 0)


def _boys0(x):
    x = max(x, 1e-16)
    return 0.5 * np.sqrt(np.pi / x) * erf(np.sqrt(x))


def test_type1_gaussian_potential_ss_closed_form():
    """<s_A| c e^{-z r_C^2} |s_B> = three-Gaussian product (exact)."""
    a, b, z, c = 0.9, 1.7, 1.24, -2.3
    p = a + b + z
    P = (a * A + b * B + z * C) / p
    pre = np.exp(
        -(
            a * b * np.sum((A - B) ** 2)
            + a * z * np.sum((A - C) ** 2)
            + b * z * np.sum((B - C) ** 2)
        )
        / p
    )
    exact = c * pre * (np.pi / p) ** 1.5

    ch = ECPChannel(-1, np.array([2]), np.array([z]), np.array([c]))
    got = type1_cart_np(_s_shell(A, a), _s_shell(B, b), C, ch)
    assert abs(got[0, 0] - exact) < 1e-12 * max(1.0, abs(exact)), (got, exact)


def test_type1_gaussian_potential_sp_closed_form():
    """<s_A| c e^{-z r_C^2} |p_B>: first Gaussian moments (exact)."""
    a, b, z, c = 1.1, 0.8, 0.9, 1.6
    p = a + b + z
    P = (a * A + b * B + z * C) / p
    pre = np.exp(
        -(
            a * b * np.sum((A - B) ** 2)
            + a * z * np.sum((A - C) ** 2)
            + b * z * np.sum((B - C) ** 2)
        )
        / p
    )
    base = c * pre * (np.pi / p) ** 1.5
    exact = base * (P - B)  # <(r-B)_x>, <(r-B)_y>, <(r-B)_z>

    ch = ECPChannel(-1, np.array([2]), np.array([z]), np.array([c]))
    got = type1_cart_np(_s_shell(A, a), _p_shell(B, b), C, ch)
    np.testing.assert_allclose(got[0, :], exact, rtol=0, atol=1e-12)


def test_type1_r1_boys_closed_form():
    """<s_A| c r_C^{-1} e^{-z r_C^2} |s_B>: Boys-function closed form."""
    a, b, z, c = 0.7, 1.3, 0.8, 2.1
    # product of the two basis Gaussians: exponent p at center Q
    p = a + b
    Q = (a * A + b * B) / p
    kab = np.exp(-a * b / p * np.sum((A - B) ** 2))
    # merge with the potential Gaussian (exponent z at C): exponent p+z
    # at R, then the 1/|r-C| Coulomb factor gives 2 pi/(p+z) F0(...)
    pz = p + z
    R = (p * Q + z * C) / pz
    kqc = np.exp(-p * z / pz * np.sum((Q - C) ** 2))
    exact = c * kab * kqc * (2.0 * np.pi / pz) * _boys0(
        pz * np.sum((R - C) ** 2)
    )

    ch = ECPChannel(-1, np.array([1]), np.array([z]), np.array([c]))
    got = type1_cart_np(_s_shell(A, a), _s_shell(B, b), C, ch)
    assert abs(got[0, 0] - exact) < 1e-10 * max(1.0, abs(exact)), (got, exact)


def _type2_l0_ss_exact(a, b, z, c):
    """4 pi c / (2 kA kB) e^{-a dA^2 - b dB^2} * 1/2 sqrt(pi/p) *
    [e^{(kA+kB)^2/4p} - e^{(kA-kB)^2/4p}], p = a+b+z."""
    dA = np.linalg.norm(A - C)
    dB = np.linalg.norm(B - C)
    kA, kB = 2.0 * a * dA, 2.0 * b * dB
    p = a + b + z
    pref = 4.0 * np.pi * c / (2.0 * kA * kB) * np.exp(-a * dA**2 - b * dB**2)
    gauss = 0.5 * np.sqrt(np.pi / p)
    return pref * gauss * (
        np.exp((kA + kB) ** 2 / (4 * p)) - np.exp((kA - kB) ** 2 / (4 * p))
    )


def test_type2_l0_ss_closed_form():
    """Semi-local l=0 projector over s shells: Bessel-sum closed form."""
    a, b, z, c = 0.9, 1.4, 1.1, 3.0
    exact = _type2_l0_ss_exact(a, b, z, c)
    ch = ECPChannel(0, np.array([2]), np.array([z]), np.array([c]))
    got = type2_cart_np(_s_shell(A, a), _s_shell(B, b), C, ch)
    assert abs(got[0, 0] - exact) < 1e-10 * max(1.0, abs(exact)), (got, exact)


def test_engine_matches_closed_forms():
    """The TPU ECP engine end-to-end against the same exact anchors."""
    from joltqc_tpu.mol.layout import BasisLayout
    from joltqc_tpu.scf.ecp import ECPEngine

    a, b = 0.9, 1.4
    zg, cg = 1.24, -2.3  # local Gaussian channel (n=2)
    z0, c0 = 1.1, 3.0  # l=0 semi-local channel (n=2)
    bohr = 0.52917721092

    ecp_txt = f"""
ECP
He nelec 0
He ul
2 {zg} {cg}
He S
2 {z0} {c0}
END
"""
    mol = Molecule.from_atom_string(
        f"H {A[0]*bohr} {A[1]*bohr} {A[2]*bohr};"
        f" H {B[0]*bohr} {B[1]*bohr} {B[2]*bohr};"
        f" He {C[0]*bohr} {C[1]*bohr} {C[2]*bohr}",
        basis="sto-3g",
        ecp=ecp_txt,
    )
    # overwrite the basis with bare single primitives (coef 1) on the two
    # H centers; the He center carries only the ECP
    mol.shells = [_s_shell(A, a), _s_shell(B, b)]
    layout = BasisLayout(mol)
    mat = ECPEngine(layout).build()

    # closed-form <sA|U|sB>: local Gaussian + l=0 semi-local
    p = a + b + zg
    pre = np.exp(
        -(
            a * b * np.sum((A - B) ** 2)
            + a * zg * np.sum((A - C) ** 2)
            + b * zg * np.sum((B - C) ** 2)
        )
        / p
    )
    exact = cg * pre * (np.pi / p) ** 1.5 + _type2_l0_ss_exact(a, b, z0, c0)
    assert abs(mat[0, 1] - exact) < 1e-9 * max(1.0, abs(exact)), (
        mat[0, 1],
        exact,
    )
