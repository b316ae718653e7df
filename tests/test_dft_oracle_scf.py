"""End-to-end RKS validation against a fully-independent f64 oracle SCF.

The oracle runs the same SCF loop with dense f64 numpy ERIs
(mol/intor_np.py, incl. erf-attenuated for RSH) and f64 numpy grid
integration (mol/numint_np.py, incl. tau rows for mGGA) on the SAME
quadrature grid -- so the comparison isolates the TPU engine's numerical
error (f32 numint tier + DF64/f32 mixed JK) from quadrature and basis
effects.  This substitutes for the reference's CPU-PySCF oracle
(/root/reference/jqc/pyscf/tests/test_dft.py) in an environment with no
external QC package.
"""

import numpy as np
import pytest
from scipy.linalg import eigh

from joltqc_tpu.dft.grids import Grids
from joltqc_tpu.dft.xc import eval_xc, rsh_coeff, xc_family
from joltqc_tpu.mol import Molecule, intor_np
from joltqc_tpu.mol.layout import BasisLayout
from joltqc_tpu.mol.numint_np import eval_rho_np, eval_vxc_np
from joltqc_tpu.scf import RKS
from joltqc_tpu.scf.diis import DIIS

H2O = "O 0 0 0.1174; H -0.757 0 -0.4696; H 0.757 0 -0.4696"


def oracle_rks(mol, xc, grids, conv_tol=1e-10, max_cycle=50):
    """Dense-f64 reference RKS (host numpy only; no VV10)."""
    layout = BasisLayout(mol)
    fam = xc_family(xc)
    omega, alpha, hyb = rsh_coeff(xc)
    s = intor_np.overlap(mol)
    h = intor_np.kinetic(mol) + intor_np.nuclear(mol)
    eri = intor_np.eri(mol)
    eri_lr = intor_np.eri(mol, omega=omega) if omega > 0 else None
    e_nuc = mol.energy_nuc()
    nocc = mol.nelectron // 2
    _, c = eigh(h, s)
    dm = 2.0 * c[:, :nocc] @ c[:, :nocc].T
    diis = DIIS()
    e_last = 0.0
    for cycle in range(max_cycle):
        dm_int = layout.dm_to_internal(dm)
        rho = eval_rho_np(layout, grids.coords, dm_int, fam)
        sigma = (rho[1:4] ** 2).sum(0) if fam != "lda" else None
        tau = rho[4] if fam == "mgga" else None
        e_xc, vr, vs, vt = eval_xc(xc, rho[0], sigma, tau)
        w = grids.weights
        exc = float(np.sum(w * e_xc))
        if fam == "lda":
            wv = (w * vr)[None]
        else:
            rows = [(w * vr)[None], 2.0 * (w * vs)[None] * rho[1:4]]
            if fam == "mgga":
                rows.append((w * vt)[None])
            wv = np.concatenate(rows)
        vxc = layout.mat_to_mol(eval_vxc_np(layout, grids.coords, wv, fam))
        vj = np.einsum("ijkl,kl->ij", eri, dm)
        veff = vxc + vj
        if hyb > 0 or omega > 0:
            vk = hyb * np.einsum("ikjl,kl->ij", eri, dm)
            if omega > 0 and abs(alpha - hyb) > 1e-12:
                vk = vk + (alpha - hyb) * np.einsum("ikjl,kl->ij", eri_lr, dm)
            veff -= 0.5 * vk
            exc -= 0.25 * float(np.einsum("ij,ij->", dm, vk))
        e_tot = (
            float(np.einsum("ij,ij->", dm, h))
            + 0.5 * float(np.einsum("ij,ij->", dm, vj))
            + exc
            + e_nuc
        )
        f = diis.update(s, dm, h + veff)
        _, c = eigh(f, s)
        dm = 2.0 * c[:, :nocc] @ c[:, :nocc].T
        if abs(e_tot - e_last) < conv_tol and cycle > 0:
            return e_tot
        e_last = e_tot
    return e_tot


@pytest.mark.slow
@pytest.mark.parametrize("xc", ["lda,vwn", "pbe", "b3lyp"])
def test_rks_vs_oracle_h2o(xc):
    mol = Molecule.from_atom_string(H2O)
    grids = Grids(mol, n_rad=50, n_theta=12).build()
    e_ref = oracle_rks(mol, xc, grids)
    mf = RKS(mol, xc=xc, grids=grids, conv_tol=1e-9, max_cycle=40)
    e = mf.kernel()
    assert mf.converged
    # mixed-precision numint (f32 bulk + DF64 heavy pairs, dft/mixed.py):
    # the reference's 1e-8 Ha mixed-precision envelope
    assert abs(e - e_ref) < 1e-8, (e, e_ref)


@pytest.mark.slow
@pytest.mark.parametrize("xc", ["b97", "wb97x-v", "b97m-test"])
def test_rks_rsh_mgga_vs_oracle_h2o(xc):
    """RSH (erf-attenuated K) + mGGA (tau) SCF vs the f64 oracle.

    VV10 is switched off on both sides to isolate the RSH/mGGA path
    (VV10 itself is validated in tests/test_vv10.py).  The mGGA case
    runs the synthetic registered functional from test_xc_b97 (the
    shipped wb97m-v data failed anchor verification and was deleted)."""
    if xc == "b97m-test":
        from joltqc_tpu.dft import xc as xcmod
        from joltqc_tpu.dft.xc import XCInfo, _make_b97
        from test_xc_b97 import _B97M_TEST

        xcmod._ALIASES["b97m-test"] = XCInfo(
            "mgga", _make_b97(_B97M_TEST), 0.15, 1.0, 0.3, (6.0, 0.01)
        )
    mol = Molecule.from_atom_string(H2O)
    grids = Grids(mol, n_rad=50, n_theta=12).build()
    e_ref = oracle_rks(mol, xc, grids)
    mf = RKS(mol, xc=xc, grids=grids, nlc=False, conv_tol=1e-9, max_cycle=40)
    e = mf.kernel()
    assert mf.converged
    assert abs(e - e_ref) < 1e-8, (e, e_ref)




@pytest.mark.slow
def test_incremental_dft_identical_energy_fewer_blocks():
    """Incremental DFT: same energy, fewer evaluated grid blocks in the
    converged tail (reference jqc/pyscf/rks.py:290,329-359)."""
    mol = Molecule.from_atom_string(H2O)
    grids = Grids(mol, n_rad=50, n_theta=12).build()
    mf0 = RKS(mol, xc="pbe", grids=grids, conv_tol=1e-10, max_cycle=40)
    e0 = mf0.kernel()
    mf1 = RKS(
        mol, xc="pbe", grids=grids, conv_tol=1e-10, max_cycle=40,
        incremental=True,
    )
    e1 = mf1.kernel()
    assert abs(e0 - e1) < 5e-9, (e0, e1)
    ncyc = mf1.scf_summary["cycles"]
    nblk = len(mf1._block_bounds())
    # 2 evals (rho+vxc) per cycle at full coverage would be 2*ncyc*nblk
    assert mf1.dft_block_evals < 2 * ncyc * nblk, (
        mf1.dft_block_evals, ncyc, nblk
    )
