"""Device one-electron integrals (scf/int1e.py) vs the numpy oracle.

Covers s/p/d shells, multi-segment contractions (6-31g* oxygen s has 6
primitives -> two 3-prim segments sharing AO columns), and the
kinetic-energy lj+2 recursion.  The oracle (mol/intor_np.py) is the
trusted slow path; DF64 device results must match to ~1e-12 absolute.
"""

import numpy as np
import pytest

from joltqc_tpu.mol import Molecule, intor_np
from joltqc_tpu.mol.layout import BasisLayout
from joltqc_tpu.scf.int1e import Int1eEngine

H2O = "O 0 0 0.1174; H -0.757 0 -0.4696; H 0.757 0 -0.4696"


@pytest.fixture(scope="module", params=["sto-3g", "6-31g*"])
def setup(request):
    mol = Molecule.from_atom_string(H2O, basis=request.param)
    eng = Int1eEngine(BasisLayout(mol), chunk=128)
    return mol, eng


def test_overlap(setup):
    mol, eng = setup
    ref = intor_np.overlap(mol)
    out = eng.overlap()
    assert np.abs(out - ref).max() < 1e-12


def test_kinetic(setup):
    mol, eng = setup
    ref = intor_np.kinetic(mol)
    out = eng.kinetic()
    assert np.abs(out - ref).max() < 1e-11


def test_nuclear(setup):
    mol, eng = setup
    ref = intor_np.nuclear(mol)
    out = eng.nuclear()
    assert np.abs(out - ref).max() < 1e-11


def test_stv_combined():
    mol = Molecule.from_atom_string(H2O, basis="6-31g*")
    eng = Int1eEngine(BasisLayout(mol), chunk=128)
    s, t, v = eng.stv()
    assert np.abs(s - intor_np.overlap(mol)).max() < 1e-12
    assert np.abs(t - intor_np.kinetic(mol)).max() < 1e-11
    assert np.abs(v - intor_np.nuclear(mol)).max() < 1e-11
