"""Basis-set sweep: production JK engine vs dense oracle across families.

Mirrors the reference's sweep suite (/root/reference/jqc/pyscf/tests/
test_basis_sets_jk.py: sto-3g...cc-pvtz x mixed precision): every basis
family shipped in mol/basis_data is exercised through the production
JKEngine against the numpy oracle, at the mixed tier (1e-6 envelope) and
the all-DF64 tier (1e-9 envelope), on molecules covering H/N/O centers
and s/p/d/f shells.
"""

import numpy as np
import pytest

from joltqc_tpu.mol import Molecule, intor_np
from joltqc_tpu.mol.layout import BasisLayout
from joltqc_tpu.scf import JKEngine

H2O = """O  0.0000000000 -0.0000000000  0.1174000000
H -0.7570000000 -0.0000000000 -0.4696000000
H  0.7570000000  0.0000000000 -0.4696000000"""

NH3 = """N  0.0000000000  0.0000000000  0.1173470000
H  0.0000000000  0.9326490000 -0.2738090000
H  0.8077180000 -0.4663250000 -0.2738090000
H -0.8077180000 -0.4663250000 -0.2738090000"""


def _rand_sym_dm(nao, seed):
    rng = np.random.default_rng(seed)
    a = rng.uniform(-1, 1, (nao, nao))
    return a + a.T


def _ref_jk(mol, dm):
    g = intor_np.eri(mol)
    vj = np.einsum("ijkl,kl->ij", g, dm)
    vk = np.einsum("ikjl,kl->ij", g, dm)
    return vj, vk


# d-shell bases compile multi-minute DF64-emulation class sets on the
# 1-CPU box, and running MANY of them in one pytest process accumulates
# XLA:CPU compile memory until it segfaults (observed r5 at
# nh3/def2-svp after ~35 prior tests) -- keep them in the slow tier,
# which runs with per-worker process recycling.
@pytest.mark.parametrize(
    "basis",
    ["sto-3g", "6-31g",
     pytest.param("6-31g*", marks=pytest.mark.slow),
     pytest.param("def2-svp", marks=pytest.mark.slow)],
)
def test_h2o_jk_sweep_mixed(basis):
    mol = Molecule.from_atom_string(H2O, basis=basis)
    dm = _rand_sym_dm(mol.nao, seed=11)
    vj_ref, vk_ref = _ref_jk(mol, dm)
    eng = JKEngine(BasisLayout(mol), cutoff_fp32=1e-13, cutoff_fp64=1e-6)
    vj, vk = eng.get_jk(dm)
    assert np.abs(vj - vj_ref).max() < 1e-6, (basis, np.abs(vj - vj_ref).max())
    assert np.abs(vk - vk_ref).max() < 1e-6, (basis, np.abs(vk - vk_ref).max())


@pytest.mark.parametrize(
    "basis",
    ["6-31g", pytest.param("def2-svp", marks=pytest.mark.slow)],
)
def test_nh3_jk_sweep_df64(basis):
    mol = Molecule.from_atom_string(NH3, basis=basis)
    dm = _rand_sym_dm(mol.nao, seed=12)
    vj_ref, vk_ref = _ref_jk(mol, dm)
    eng = JKEngine(BasisLayout(mol), cutoff_fp32=1e-30, cutoff_fp64=1e-30)
    vj, vk = eng.get_jk(dm)
    assert np.abs(vj - vj_ref).max() < 1e-9, (basis, np.abs(vj - vj_ref).max())
    assert np.abs(vk - vk_ref).max() < 1e-9, (basis, np.abs(vk - vk_ref).max())


@pytest.mark.slow
def test_h2_def2_tzvpp_jk_mixed():
    """def2-tzvpp reaches d shells on H (f on heavy atoms covered by
    tests/test_def2.py's published-anchor SCF)."""
    mol = Molecule.from_atom_string("H 0 0 0; H 0 0 0.74", basis="def2-tzvpp")
    dm = _rand_sym_dm(mol.nao, seed=13)
    vj_ref, vk_ref = _ref_jk(mol, dm)
    eng = JKEngine(BasisLayout(mol), cutoff_fp32=1e-13, cutoff_fp64=1e-6)
    vj, vk = eng.get_jk(dm)
    assert np.abs(vj - vj_ref).max() < 1e-6, np.abs(vj - vj_ref).max()
    assert np.abs(vk - vk_ref).max() < 1e-6, np.abs(vk - vk_ref).max()


@pytest.mark.slow
def test_h2o_def2_svp_jk_omega_sweep():
    """Range-separated kernel across a basis with d shells."""
    mol = Molecule.from_atom_string(H2O, basis="def2-svp")
    dm = _rand_sym_dm(mol.nao, seed=14)
    g = intor_np.eri(mol, omega=0.33)
    vj_ref = np.einsum("ijkl,kl->ij", g, dm)
    vk_ref = np.einsum("ikjl,kl->ij", g, dm)
    eng = JKEngine(BasisLayout(mol), cutoff_fp32=1e-30, cutoff_fp64=1e-30)
    vj, vk = eng.get_jk(dm, omega=0.33)
    assert np.abs(vj - vj_ref).max() < 1e-9, np.abs(vj - vj_ref).max()
    assert np.abs(vk - vk_ref).max() < 1e-9, np.abs(vk - vk_ref).max()
