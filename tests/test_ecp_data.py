"""Shipped ECP data: name resolution + SCF composition with the model
potential (the standalone analogue of the reference's named-ECP flow,
/root/reference/jqc/pyscf/tests/test_dft_ecp.py:22 ecp="def2-tzvpp")."""

import numpy as np
import pytest

from joltqc_tpu.mol import Molecule
from joltqc_tpu.mol.ecp import available_ecps, load_ecp


def test_shipped_ecp_resolves_by_name():
    assert "jqc-model" in available_ecps()
    data = load_ecp("jqc-model")
    assert data["Na"].ncore == 10
    assert data["I"].ncore == 28
    ls = sorted(c.l for c in data["I"].channels)
    assert ls == [-1, 0, 1, 2]


def test_unknown_ecp_message():
    with pytest.raises(FileNotFoundError, match="jqc-model"):
        load_ecp("def2-nonexistent")


@pytest.mark.slow
def test_nah_scf_with_model_ecp():
    """NaH with the model large-core ECP: 2 valence electrons, stable
    SCF, energy anchored as a regression value (cross-checked against
    the adaptive-quadrature oracle through the ECPEngine tests)."""
    with pytest.warns(UserWarning, match="GENERATED"):
        mol = Molecule.from_atom_string(
            "Na 0 0 0; H 0 0 1.89", basis="sto-3g", ecp="jqc-model"
        )
    assert mol.nelectron == 2
    np.testing.assert_allclose(mol.atom_charges_eff, [1.0, 1.0])

    from joltqc_tpu.scf import RHF

    mf = RHF(mol, conv_tol=1e-8, max_cycle=60)
    e = mf.kernel()
    assert mf.converged
    # valence-only NaH with Zeff=1 on Na: energy in the H2-like window
    assert -1.5 < e < -0.3
