"""VV10 nonlocal correlation vs f64 oracle + potential consistency.

Reference counterpart: vv10 kernel tests inside
/root/reference/jqc/pyscf/tests/test_rks.py + benchmark_nr_nlc_vxc.py.
"""

import numpy as np
import pytest

from joltqc_tpu.dft.vv10 import nlc_exc_vxc, nlc_exc_vxc_np


@pytest.fixture(scope="module")
def cloud():
    rng = np.random.default_rng(0)
    N = 512
    return (
        rng.uniform(-3, 3, (N, 3)),
        rng.uniform(0.001, 0.01, N),
        rng.uniform(1e-4, 2.0, N),
        rng.uniform(1e-6, 5.0, N),
    )


def test_vv10_energy_vs_oracle(cloud):
    coords, w, rho, sigma = cloud
    e, _, _ = nlc_exc_vxc(coords, w, rho, sigma, block=128)
    e_ref = nlc_exc_vxc_np(coords, w, rho, sigma)
    assert abs(e - e_ref) / abs(e_ref) < 1e-5


def test_vv10_potential_fd(cloud):
    coords, w, rho, sigma = cloud
    _, vr, vs = nlc_exc_vxc(coords, w, rho, sigma, block=128)
    h = 1e-4
    for i in (7, 100):
        rp, rm = rho.copy(), rho.copy()
        rp[i] += h
        rm[i] -= h
        fd = (
            nlc_exc_vxc_np(coords, w, rp, sigma)
            - nlc_exc_vxc_np(coords, w, rm, sigma)
        ) / (2 * h)
        # unweighted convention: dE/drho_i = w_i * vr_i
        np.testing.assert_allclose(w[i] * vr[i], fd, rtol=2e-4)
        sp, sm = sigma.copy(), sigma.copy()
        sp[i] += h
        sm[i] -= h
        fd = (
            nlc_exc_vxc_np(coords, w, rho, sp)
            - nlc_exc_vxc_np(coords, w, rho, sm)
        ) / (2 * h)
        np.testing.assert_allclose(w[i] * vs[i], fd, rtol=2e-4)


def test_vv10_threshold_masks_tiny_rho(cloud):
    coords, w, rho, sigma = cloud
    rho2 = rho.copy()
    rho2[::2] = 1e-12  # below threshold: these points must drop out
    e, vr, _ = nlc_exc_vxc(coords, w, rho2, sigma, block=128)
    keep = rho2 > 1e-8
    e_ref = nlc_exc_vxc_np(coords, w, rho2, sigma)
    assert abs(e - e_ref) / abs(e_ref) < 1e-5
    assert np.all(vr[~keep] == 0)


@pytest.mark.slow
def test_rks_vv10_scf():
    from joltqc_tpu.dft.grids import Grids
    from joltqc_tpu.mol import Molecule
    from joltqc_tpu.scf import RKS

    mol = Molecule.from_atom_string(
        "O 0 0 0.1174; H -0.757 0 -0.4696; H 0.757 0 -0.4696"
    )
    grids = Grids(mol, n_rad=40, n_theta=10, block=512).build()
    e_base = RKS(mol, xc="pbe", grids=grids, conv_tol=1e-8).kernel()
    mf = RKS(mol, xc="pbe", grids=grids, nlc=True, conv_tol=1e-8)
    e = mf.kernel()
    assert mf.converged
    # VV10 on a 10-electron molecule adds a small positive-definite-ish
    # correlation shift of ~0.02-0.05 Ha
    assert 0.005 < e - e_base < 0.1, (e, e_base)
