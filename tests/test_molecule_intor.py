"""Molecule/basis layer + numpy oracle integral sanity checks.

Anchors: closed-form gaussian integrals and a literature RHF energy for
H2/STO-3G (the same kind of absolute-energy anchoring the reference uses
via hardcoded CPU-PySCF references, /root/reference/jqc/pyscf/tests/
test_scf.py:70-77).
"""

import numpy as np
import pytest

from joltqc_tpu.mol import Molecule
from joltqc_tpu.mol import intor_np as intor

H2 = "H 0 0 0; H 0 0 0.74"  # Angstrom (the geometry of the classic
# -1.11675930740 STO-3G literature number)
H2O = """O  0.0000000000 -0.0000000000  0.1174000000
H -0.7570000000 -0.0000000000 -0.4696000000
H  0.7570000000  0.0000000000 -0.4696000000"""


def test_build_counts():
    mol = Molecule.from_atom_string(H2O, basis="sto-3g")
    # O: 1s, 2s, 2p ; H: 1s each -> shells 5, nao = 1+1+3+1+1 = 7
    assert len(mol.shells) == 5
    assert mol.nao == 7
    assert mol.nelectron == 10
    mol2 = Molecule.from_atom_string(H2O, basis="6-31g")
    assert mol2.nao == 13


def test_overlap_normalized_diag():
    for basis in ["sto-3g", "6-31g"]:
        for cart in [False, True]:
            mol = Molecule.from_atom_string(H2O, basis=basis, cart=cart)
            s = intor.overlap(mol)
            np.testing.assert_allclose(np.diag(s), 1.0, atol=1e-12)
            # symmetric positive definite
            assert np.all(np.linalg.eigvalsh(s) > 0)


def test_kinetic_vs_closed_form():
    # single s primitive: T_ii = 3*alpha/2 for normalized gaussian
    mol = Molecule.from_atom_string("H 0 0 0", basis="sto-3g")
    # replace with single primitive
    mol.shells = mol.shells[:1]
    mol.shells[0].exps = np.array([0.8])
    from joltqc_tpu.mol.basis import normalize_contraction

    mol.shells[0].coeffs = normalize_contraction(0, mol.shells[0].exps, np.array([1.0]))
    t = intor.kinetic(mol)
    np.testing.assert_allclose(t[0, 0], 1.5 * 0.8 * 0.5 * 2, rtol=1e-12)


def test_nuclear_energy():
    mol = Molecule.from_atom_string(H2, basis="sto-3g")
    # R = 0.7414 A = 1.40104... a0; E_nn = 1/R
    from joltqc_tpu.mol.elements import BOHR

    np.testing.assert_allclose(mol.energy_nuc(), BOHR / 0.74, rtol=1e-10)


def _rhf_dense(mol):
    """Tiny dense RHF using oracle integrals (test helper)."""
    s = intor.overlap(mol)
    h = intor.kinetic(mol) + intor.nuclear(mol)
    g = intor.eri(mol)
    nocc = mol.nelectron // 2
    # core guess
    from scipy.linalg import eigh

    e, c = eigh(h, s)
    for _ in range(60):
        dm = 2 * c[:, :nocc] @ c[:, :nocc].T
        j = np.einsum("ijkl,kl->ij", g, dm)
        k = np.einsum("ikjl,kl->ij", g, dm)
        f = h + j - 0.5 * k
        e, c = eigh(f, s)
    dm = 2 * c[:, :nocc] @ c[:, :nocc].T
    e_el = 0.5 * np.einsum("ij,ij->", dm, h + f)
    return e_el + mol.energy_nuc()


def test_h2_sto3g_rhf_literature():
    mol = Molecule.from_atom_string(H2, basis="sto-3g")
    e = _rhf_dense(mol)
    # standard literature value for H2/STO-3G at 0.74 A
    assert abs(e - (-1.11675930740)) < 5e-7, e


def test_h2o_sto3g_rhf_oracle_value():
    mol = Molecule.from_atom_string(H2O, basis="sto-3g")
    e = _rhf_dense(mol)
    # frozen all-float64 oracle value for this geometry (regression anchor;
    # also reproduced by the TPU engine to 1e-9)
    assert abs(e - (-74.9630631297)) < 1e-8, e


def test_eri_symmetry_and_cart_sph_consistency():
    mol_s = Molecule.from_atom_string(H2O, basis="sto-3g", cart=False)
    g = intor.eri(mol_s)
    np.testing.assert_allclose(g, g.transpose(1, 0, 2, 3), atol=1e-12)
    np.testing.assert_allclose(g, g.transpose(2, 3, 0, 1), atol=1e-12)
    # trace-type invariant equal in cart and sph for l<=1 (same span)
    mol_c = Molecule.from_atom_string(H2O, basis="sto-3g", cart=True)
    e_s = _rhf_dense(mol_s)
    e_c = _rhf_dense(mol_c)
    assert abs(e_s - e_c) < 1e-8
