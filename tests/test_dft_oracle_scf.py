"""End-to-end RKS validation against a fully-independent f64 oracle SCF.

The oracle runs the same SCF loop with dense f64 numpy ERIs
(mol/intor_np.py) and f64 numpy grid integration (mol/numint_np.py) on
the SAME quadrature grid -- so the comparison isolates the TPU engine's
numerical error (f32 numint tier + DF64/f32 mixed JK) from quadrature
and basis effects.  This substitutes for the reference's CPU-PySCF
oracle (/root/reference/jqc/pyscf/tests/test_dft.py) in an environment
with no external QC package.
"""

import numpy as np
import pytest
from scipy.linalg import eigh

from joltqc_tpu.dft.grids import Grids
from joltqc_tpu.dft.xc import eval_xc, hybrid_coeff, is_gga
from joltqc_tpu.mol import Molecule, intor_np
from joltqc_tpu.mol.layout import BasisLayout
from joltqc_tpu.mol.numint_np import eval_rho_np, eval_vxc_np
from joltqc_tpu.scf import RKS
from joltqc_tpu.scf.diis import DIIS

H2O = "O 0 0 0.1174; H -0.757 0 -0.4696; H 0.757 0 -0.4696"


def oracle_rks(mol, xc, grids, conv_tol=1e-10, max_cycle=50):
    """Dense-f64 reference RKS (host numpy only)."""
    layout = BasisLayout(mol)
    gga = is_gga(xc)
    hyb = hybrid_coeff(xc)
    s = intor_np.overlap(mol)
    h = intor_np.kinetic(mol) + intor_np.nuclear(mol)
    eri = intor_np.eri(mol)
    e_nuc = mol.energy_nuc()
    nocc = mol.nelectron // 2
    _, c = eigh(h, s)
    dm = 2.0 * c[:, :nocc] @ c[:, :nocc].T
    diis = DIIS()
    e_last = 0.0
    for cycle in range(max_cycle):
        dm_int = layout.dm_to_internal(dm)
        rho = eval_rho_np(layout, grids.coords, dm_int, gga)
        sigma = (rho[1:] ** 2).sum(0) if gga else None
        e_xc, vr, vs = eval_xc(xc, rho[0], sigma)
        w = grids.weights
        exc = float(np.sum(w * e_xc))
        wv = (
            np.concatenate([(w * vr)[None], 2.0 * (w * vs)[None] * rho[1:]])
            if gga
            else (w * vr)[None]
        )
        vxc = layout.mat_to_mol(eval_vxc_np(layout, grids.coords, wv, gga))
        vj = np.einsum("ijkl,kl->ij", eri, dm)
        veff = vxc + vj
        if hyb > 0:
            vk = np.einsum("ikjl,kl->ij", eri, dm)
            veff -= 0.5 * hyb * vk
            exc -= 0.25 * hyb * float(np.einsum("ij,ij->", dm, vk))
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
    # f32 numint tier: absolute agreement at the mixed-precision envelope
    assert abs(e - e_ref) < 5e-6, (e, e_ref)
