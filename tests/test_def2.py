"""def2 basis family: structure checks + published energy anchors.

The def2-SVP / def2-TZVPP data files were transcribed without network
access (see joltqc_tpu/mol/basis_data/def2-tzvpp.dat provenance notes);
the H/O data is VERIFIED by reproducing the published H2O
RHF/def2-TZVPP total energy -76.0624634523
(/root/reference/jqc/pyscf/tests/test_scf.py:70-72) -- a 1e-6-sensitive
anchor: any wrong exponent/coefficient digit or contraction-structure
error shifts the energy by far more.
"""

import numpy as np
import pytest
from scipy.linalg import eigh

from joltqc_tpu.mol import Molecule, intor_np
from joltqc_tpu.scf.diis import DIIS

H2O = "O 0 0 0.1174; H -0.757 0 -0.4696; H 0.757 0 -0.4696"


def _rhf_dense(mol, max_cycle=80, tol=1e-11):
    """Plain dense-oracle RHF (no jit; independent of the TPU engine)."""
    s = intor_np.overlap(mol)
    h = intor_np.kinetic(mol) + intor_np.nuclear(mol)
    g = intor_np.eri(mol)
    nocc = mol.nelectron // 2
    _, c = eigh(h, s)
    dm = 2 * c[:, :nocc] @ c[:, :nocc].T
    diis = DIIS()
    e_last = 0.0
    for it in range(max_cycle):
        vj = np.einsum("ijkl,kl->ij", g, dm)
        vk = np.einsum("ikjl,kl->ij", g, dm)
        f = h + vj - 0.5 * vk
        e = 0.5 * np.einsum("ij,ij->", dm, h + f) + mol.energy_nuc()
        _, c = eigh(diis.update(s, dm, f), s)
        dm = 2 * c[:, :nocc] @ c[:, :nocc].T
        if abs(e - e_last) < tol and it > 1:
            break
        e_last = e
    return e, dm


def test_def2_tzvpp_structure():
    mol = Molecule.from_atom_string(H2O, basis="def2-tzvpp")
    assert mol.nao == 59  # O [5s3p2d1f]=31 + 2 x H [3s2p1d]=14
    o_shells = [(s.l, s.nprim) for s in mol.shells if s.atom_idx == 0]
    assert o_shells == [
        (0, 6), (0, 2), (0, 1), (0, 1), (0, 1),
        (1, 4), (1, 1), (1, 1),
        (2, 1), (2, 1), (3, 1),
    ]
    h_shells = [(s.l, s.nprim) for s in mol.shells if s.atom_idx == 1]
    assert h_shells == [(0, 3), (0, 1), (0, 1), (1, 1), (1, 1), (2, 1)]


def test_def2_svp_structure():
    mol = Molecule.from_atom_string(H2O, basis="def2-svp")
    # O [3s2p1d]=14 + 2 x H [2s1p]=5
    assert mol.nao == 24


@pytest.mark.slow
def test_h2o_rhf_def2_tzvpp_published_anchor():
    """Published anchor: -76.0624634523 (ref test_scf.py:70-72)."""
    mol = Molecule.from_atom_string(H2O, basis="def2-tzvpp")
    e, _ = _rhf_dense(mol)
    assert abs(e - (-76.0624634523)) < 1e-6, e


@pytest.mark.slow
def test_h2o_rhf_def2_svp_engine_vs_oracle():
    """Production JKEngine SCF == dense-oracle SCF on def2-SVP (d shells)."""
    from joltqc_tpu.scf import RHF

    mol = Molecule.from_atom_string(H2O, basis="def2-svp")
    e_ref, _ = _rhf_dense(mol)
    mf = RHF(mol, conv_tol=1e-10)
    e = mf.kernel()
    assert abs(e - e_ref) < 1e-8, (e, e_ref)


@pytest.mark.slow
def test_h2o_rhf_def2_tzvpp_engine_published_anchor():
    """Engine-level f-shell anchor (VERDICT r2 item 8): H2O/def2-tzvpp
    RHF through the PRODUCTION JKEngine (mixed DF64/f32 tiers, d AND f
    shells) against the published -76.0624634523
    (/root/reference/jqc/pyscf/tests/test_scf.py:70-72) -- previously
    this anchor was reproduced only by the numpy oracle."""
    from joltqc_tpu.scf import RHF

    mol = Molecule.from_atom_string(H2O, basis="def2-tzvpp")
    mf = RHF(mol, conv_tol=1e-10)
    e = mf.kernel()
    assert mf.converged
    assert abs(e - (-76.0624634523)) < 1e-6, e
