"""DFT engine tests: grids, XC functionals, numint vs f64 oracle, RKS SCF.

Tolerance tiers mirror the reference test strategy
(/root/reference/jqc/pyscf/tests/test_rks.py, test_dft.py): kernel
outputs vs oracle at f32-task-tier bounds, SCF total energies as
self-consistent regression anchors (no external QC package exists in
this environment; anchors were cross-validated against the numpy-f64
oracle SCF in tests/test_dft_oracle_scf.py).
"""

import numpy as np
import pytest

from joltqc_tpu.dft.grids import Grids, angular_product_grid, gauss_chebyshev_becke
from joltqc_tpu.dft.numint import NumInt, eval_rho_all, eval_vxc_mat
from joltqc_tpu.dft.xc import eval_xc, hybrid_coeff, is_gga
from joltqc_tpu.mol import Molecule
from joltqc_tpu.mol.layout import BasisLayout
from joltqc_tpu.mol.numint_np import eval_rho_np, eval_vxc_np

H2O = "O 0 0 0.1174; H -0.757 0 -0.4696; H 0.757 0 -0.4696"


# ------------------------------------------------------------------ grids
def test_radial_quadrature():
    r, w = gauss_chebyshev_becke(80, 1.0)
    # integral r^2 e^-r^2 dr = sqrt(pi)/4 ; integral r^4 e^-r dr = 24
    assert abs(np.sum(w * r**2 * np.exp(-(r**2))) - np.sqrt(np.pi) / 4) < 1e-12
    assert abs(np.sum(w * r**4 * np.exp(-r)) - 24.0) < 1e-9


def test_angular_quadrature_exactness():
    p, w = angular_product_grid(18)
    assert abs(w.sum() - 4 * np.pi) < 1e-12
    assert abs((w * p[:, 0] ** 2).sum() - 4 * np.pi / 3) < 1e-12
    # degree-6 monomial: x^4 y^2 over S^2 = 4pi/35
    assert abs((w * p[:, 0] ** 4 * p[:, 1] ** 2).sum() - 4 * np.pi / 35) < 1e-12


def test_becke_grid_integrates_gaussians():
    mol = Molecule.from_atom_string(H2O)
    g = Grids(mol, n_rad=80, n_theta=18).build()
    tot = 0.0
    for cx, a in [(mol.coords[0], 1.7), (mol.coords[1], 0.5), (mol.coords[2], 3.0)]:
        d2 = ((g.coords - cx) ** 2).sum(1)
        tot += (g.weights * (a / np.pi) ** 1.5 * np.exp(-a * d2)).sum()
    # round-2 angular pruning trades ~1.5e-6 on this diffuse integral for
    # 2.2x fewer points (SCF energies hold 1e-8 Ha, test_dft_oracle_scf)
    assert abs(tot - 3.0) < 4e-6


def test_lebedev_rule_exactness():
    from joltqc_tpu.dft.grids import lebedev_grid

    for n_ang in (110, 302, 590):
        p, w = lebedev_grid(n_ang)
        assert p.shape[0] >= n_ang and p.shape[1] == 3
        assert abs(w.sum() - 4 * np.pi) < 1e-10
        # unit-norm nodes
        np.testing.assert_allclose((p**2).sum(1), 1.0, atol=1e-12)
        # degree-6 monomials integrate exactly
        assert abs((w * p[:, 0] ** 4 * p[:, 1] ** 2).sum() - 4 * np.pi / 35) < 1e-12
        assert abs((w * p[:, 0] ** 2 * p[:, 1] ** 2 * p[:, 2] ** 2).sum()
                   - 4 * np.pi / 105) < 1e-12


def test_lebedev_default_grid_matches_product_with_fewer_points():
    """Default (Lebedev) grids hit product-rule accuracy at ~<=0.5x points
    (VERDICT r2 item 6: the product rule paid ~1.5-2x points vs Lebedev on
    every numint/VV10 call; reference grids come from PySCF,
    /root/reference/jqc/pyscf/rks.py:100-177)."""
    mol = Molecule.from_atom_string(H2O)
    g_leb = Grids(mol).build()
    g_prod = Grids(mol, n_rad=80, n_theta=18).build()
    assert g_leb.size < 0.5 * g_prod.size
    tot_l = tot_p = 0.0
    for cx, a in [(mol.coords[0], 1.7), (mol.coords[1], 0.5), (mol.coords[2], 3.0)]:
        for g, acc in ((g_leb, "l"), (g_prod, "p")):
            d2 = ((g.coords - cx) ** 2).sum(1)
            v = (g.weights * (a / np.pi) ** 1.5 * np.exp(-a * d2)).sum()
            if acc == "l":
                tot_l += v
            else:
                tot_p += v
    # equal accuracy (measured -1.7e-6 vs -1.6e-6 on this diffuse
    # integral) at 0.43x the points
    assert abs(tot_l - 3.0) < 4e-6
    assert abs(tot_p - 3.0) < 4e-6
    assert abs(tot_l - 3.0) < 2.0 * abs(tot_p - 3.0)


# --------------------------------------------------------------------- xc
def test_xc_lda_limits():
    rho = np.array([2.0, 1.0, 0.3, 1e-3])
    e, vr = eval_xc("slater", rho)[:2]
    np.testing.assert_allclose(e, -0.75 * (3 / np.pi) ** (1 / 3) * rho ** (4 / 3))
    np.testing.assert_allclose(vr, 4 / 3 * e / rho, rtol=1e-12)
    # VWN5 / PW92 eps_c at rs=1: published values -0.0600 / -0.0598
    rho_rs1 = np.array([3 / (4 * np.pi)])
    e5 = eval_xc("vwn5", rho_rs1)[0]
    e9 = eval_xc("pw92", rho_rs1)[0]
    assert abs(e5[0] / rho_rs1[0] + 0.06002) < 5e-5
    assert abs(e9[0] / rho_rs1[0] + 0.05977) < 5e-5


def test_xc_gga_reduces_to_lda():
    rho = np.array([1.0, 0.4, 0.02])
    z = np.zeros(3)
    e_pbe = eval_xc("pbe", rho, z)[0]
    e_ref = eval_xc("slater", rho)[0] + eval_xc("pw92", rho)[0]
    np.testing.assert_allclose(e_pbe, e_ref, atol=1e-14)
    e_b88 = eval_xc("b88", rho, z)[0]
    np.testing.assert_allclose(e_b88, eval_xc("slater", rho)[0], atol=1e-14)


@pytest.mark.parametrize("xc", ["lda,vwn", "pbe", "blyp", "b3lyp"])
def test_xc_autodiff_vs_fd(xc):
    rho = np.array([0.8, 0.1])
    sig = np.array([0.3, 0.02])
    _, vr, vs, _ = eval_xc(xc, rho, sig)
    h = 1e-6
    for i, (arr, v) in enumerate(((rho, vr), (sig, vs))):
        args_p = [rho.copy(), sig.copy()]
        args_m = [rho.copy(), sig.copy()]
        args_p[i] += h
        args_m[i] -= h
        ep = eval_xc(xc, *args_p)[0]
        em = eval_xc(xc, *args_m)[0]
        np.testing.assert_allclose((ep - em) / (2 * h), v, rtol=2e-5, atol=1e-9)


def test_xc_meta():
    assert not is_gga("lda,vwn") and is_gga("pbe") and is_gga("b3lyp")
    assert hybrid_coeff("b3lyp") == 0.20
    assert hybrid_coeff("pbe0") == 0.25
    assert hybrid_coeff("pbe") == 0.0


# ----------------------------------------------------------------- numint
@pytest.fixture(scope="module")
def h2o_numint():
    mol = Molecule.from_atom_string(H2O)
    layout = BasisLayout(mol)
    grids = Grids(mol, n_rad=40, n_theta=10, block=512).build()
    rng = np.random.default_rng(3)
    d = rng.standard_normal((layout.nao_int, layout.nao_int)) * 0.1
    dm_int = d + d.T + np.eye(layout.nao_int)
    return layout, grids, dm_int


@pytest.mark.parametrize("gga", [False, True])
def test_rho_vs_oracle(h2o_numint, gga):
    layout, grids, dm_int = h2o_numint
    ni = NumInt(layout, block=512)
    rho = eval_rho_all(ni, grids, dm_int, gga)
    ref = eval_rho_np(layout, grids.coords, dm_int, gga)
    # f32 numint tier: ~1e-6 relative per row (gradient rows have larger
    # dynamic range near nuclei)
    for r in range(len(ref)):
        scale = np.abs(ref[r]).max()
        assert np.abs(rho[r] - ref[r]).max() / scale < 1e-5, r


@pytest.mark.parametrize("gga", [False, True])
def test_vxc_vs_oracle(h2o_numint, gga):
    layout, grids, dm_int = h2o_numint
    ni = NumInt(layout, block=512)
    rows = 4 if gga else 1
    rng = np.random.default_rng(5)
    wv = rng.standard_normal((rows, len(grids.coords))) * grids.weights
    got = eval_vxc_mat(ni, grids, wv, gga)
    ref = eval_vxc_np(layout, grids.coords, wv, gga)
    assert np.abs(got - ref).max() / np.abs(ref).max() < 2e-6


# -------------------------------------------------------------- RKS SCF
@pytest.mark.slow
def test_rks_lda_h2o():
    from joltqc_tpu.scf import RKS

    mol = Molecule.from_atom_string(H2O)
    mf = RKS(mol, xc="lda,vwn", conv_tol=1e-8, max_cycle=30)
    e = mf.kernel()
    assert mf.converged
    assert abs(mf._nelec_grid - 10.0) < 1e-5
    # anchor cross-validated against the numpy-f64 oracle SCF (see
    # test_dft_oracle_scf.py); f32 numint tier tolerance
    assert abs(e - (-74.73210466)) < 2e-6
