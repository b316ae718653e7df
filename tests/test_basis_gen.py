"""Generated even-tempered fallback bases vs numerical-HF atomic limits.

The fallback (mol/basis_gen.py) is the standalone answer to element
coverage beyond the embedded data files.  Because it is uncontracted and
formula-generated, the only meaningful external anchor is the numerical
Hartree-Fock limit of closed-shell atoms (Froese-Fischer values, e.g.
Ne -128.54710, Mg -199.61464, Ar -526.81751): a sound basis lands
within a few tens of mHa ABOVE the limit; broken exponents or machinery
would miss by orders of magnitude more (or diverge).
"""

import numpy as np
import pytest

from joltqc_tpu.mol import Molecule
from joltqc_tpu.scf import RHF

HF_LIMIT = {"Ne": -128.54710, "Mg": -199.61464, "Ar": -526.81751}


def _atom(sym):
    with pytest.warns(UserWarning, match="GENERATED"):
        mol = Molecule.from_atom_string(f"{sym} 0 0 0", basis="def2-svp")
    return mol


@pytest.mark.slow
@pytest.mark.parametrize("sym,tol", [("Ne", 0.06), ("Mg", 0.06)])
def test_atomic_rhf_near_hf_limit(sym, tol):
    mol = _atom(sym)
    mf = RHF(mol, conv_tol=1e-8, max_cycle=80)
    e = mf.kernel()
    assert mf.converged
    lim = HF_LIMIT[sym]
    assert e > lim - 1e-6, f"{sym}: E={e} below the HF limit {lim}"
    assert e - lim < tol, f"{sym}: E={e} is {e - lim:.3f} Ha above limit"


@pytest.mark.slow
def test_atomic_rhf_ar():
    mol = _atom("Ar")
    mf = RHF(mol, conv_tol=1e-8, max_cycle=80)
    e = mf.kernel()
    assert mf.converged
    lim = HF_LIMIT["Ar"]
    assert e > lim - 1e-6
    assert e - lim < 0.10


def test_generated_molecule_builds():
    """Cheap machinery check (no SCF): the S fallback basis builds, has
    the right electron count, and composes with the layout."""
    mol = Molecule.from_atom_string(
        "S 0 0 0; H -0.96 0 0.52; H 0.96 0 0.52", basis="sto-3g"
    )
    assert mol.nelectron == 18
    assert len(mol.shells) > 3


@pytest.mark.slow
def test_generated_molecule_runs():
    """A suite molecule with S (absent from the embedded 6-31g data)
    builds and produces a sane Fock: machinery-level check that the
    fallback composes with the JK engine.  (slow: multi-minute
    single-core SCF with the large uncontracted generated basis)"""
    mol = Molecule.from_atom_string(
        "S 0 0 0; H -0.96 0 0.52; H 0.96 0 0.52", basis="sto-3g"
    )
    assert mol.nelectron == 18
    mf = RHF(mol, conv_tol=1e-7, max_cycle=60)
    e = mf.kernel()
    assert mf.converged
    # H2S RHF energy: > -400 (sanity window around -398.7)
    assert -399.5 < e < -397.0
