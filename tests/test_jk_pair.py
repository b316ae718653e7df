"""Pair-based J engine vs the dense oracle and the quartet engine.

Reference counterpart: /root/reference/jqc/pyscf/tests/test_jk_pair.py
(pair-algorithm vj vs PySCF incl. screening stress)."""

import numpy as np
import pytest

from joltqc_tpu.mol import Molecule, intor_np
from joltqc_tpu.mol.layout import BasisLayout
from joltqc_tpu.scf.jk_pair import PairJEngine

H2O = "O 0 0 0.1174; H -0.757 0 -0.4696; H 0.757 0 -0.4696"


def _ref_j(mol, dm):
    g = intor_np.eri(mol)
    return np.einsum("ijkl,kl->ij", g, dm)


def test_pair_j_df64_vs_oracle():
    mol = Molecule.from_atom_string(H2O, basis="sto-3g")
    rng = np.random.default_rng(0)
    a = rng.uniform(-1, 1, (mol.nao, mol.nao))
    dm = a + a.T
    vj_ref = _ref_j(mol, dm)
    eng = PairJEngine(BasisLayout(mol), cutoff_fp32=1e-30, cutoff_fp64=1e-30)
    vj = eng.get_j(dm)
    assert np.abs(vj - vj_ref).max() < 1e-9, np.abs(vj - vj_ref).max()


def test_pair_j_mixed_vs_quartet_engine():
    from joltqc_tpu.scf.jk_contracted import JKEngine

    mol = Molecule.from_atom_string(H2O, basis="sto-3g")
    rng = np.random.default_rng(2)
    a = rng.uniform(-1, 1, (mol.nao, mol.nao))
    dm = a + a.T
    vj_ref = _ref_j(mol, dm)
    pj = PairJEngine(BasisLayout(mol), cutoff_fp32=1e-14, cutoff_fp64=1e-7)
    vj_p = pj.get_j(dm)
    qe = JKEngine(BasisLayout(mol), cutoff_fp32=1e-14, cutoff_fp64=1e-7)
    vj_q, _ = qe.get_jk(dm, with_k=False)
    # both mixed-precision paths agree with the oracle at the f32 envelope
    assert np.abs(vj_p - vj_ref).max() < 1e-5
    assert np.abs(vj_q - vj_ref).max() < 1e-5


@pytest.mark.slow
def test_pair_j_631g():
    mol = Molecule.from_atom_string(H2O, basis="6-31g")
    rng = np.random.default_rng(4)
    a = rng.uniform(-0.3, 0.3, (mol.nao, mol.nao))
    dm = a + a.T + np.eye(mol.nao)
    vj_ref = _ref_j(mol, dm)
    eng = PairJEngine(BasisLayout(mol), cutoff_fp32=1e-30, cutoff_fp64=1e-30)
    vj = eng.get_j(dm)
    assert np.abs(vj - vj_ref).max() < 1e-8, np.abs(vj - vj_ref).max()


# ----------------------------------------------------------------- VK
def _ref_k(mol, dm):
    g = intor_np.eri(mol)
    return np.einsum("ijkl,jk->il", g, dm)


def test_pair_k_df64_vs_oracle():
    mol = Molecule.from_atom_string(H2O, basis="sto-3g")
    rng = np.random.default_rng(1)
    a = rng.uniform(-1, 1, (mol.nao, mol.nao))
    dm = a + a.T
    vk_ref = _ref_k(mol, dm)
    eng = PairJEngine(BasisLayout(mol), cutoff_fp32=1e-30, cutoff_fp64=1e-30)
    vk = eng.get_k(dm)
    assert np.abs(vk - vk_ref).max() < 1e-9, np.abs(vk - vk_ref).max()


def test_pair_k_mixed_vs_quartet_engine():
    from joltqc_tpu.scf.jk_contracted import JKEngine

    mol = Molecule.from_atom_string(H2O, basis="sto-3g")
    rng = np.random.default_rng(3)
    a = rng.uniform(-1, 1, (mol.nao, mol.nao))
    dm = a + a.T
    vk_ref = _ref_k(mol, dm)
    pk = PairJEngine(BasisLayout(mol), cutoff_fp32=1e-14, cutoff_fp64=1e-7)
    vk_p = pk.get_k(dm)
    qe = JKEngine(BasisLayout(mol), cutoff_fp32=1e-14, cutoff_fp64=1e-7)
    _, vk_q = qe.get_jk(dm, with_j=False)
    assert np.abs(vk_p - vk_ref).max() < 1e-5
    assert np.abs(vk_q - vk_ref).max() < 1e-5


@pytest.mark.slow
def test_pair_jk_631g_p_shells():
    """p shells + mixed contraction depth through the pair-VK path."""
    mol = Molecule.from_atom_string("O 0 0 0; H 0 0 0.96", basis="6-31g")
    rng = np.random.default_rng(4)
    a = rng.uniform(-1, 1, (mol.nao, mol.nao))
    dm = a + a.T
    eng = PairJEngine(BasisLayout(mol), cutoff_fp32=1e-30, cutoff_fp64=1e-30)
    vj, vk = eng.get_jk(dm)
    assert np.abs(vj - _ref_j(mol, dm)).max() < 1e-9
    assert np.abs(vk - _ref_k(mol, dm)).max() < 1e-9
