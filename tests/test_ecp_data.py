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
    """NaH with the model large-core ECP: the engine SCF must hit the
    independently-computed anchor (full numpy RHF with the
    adaptive-quadrature ECP oracle mol/ecp_np.py::ecp_matrix_np; the
    standalone analogue of the reference's def2-ECP anchor test,
    /root/reference/jqc/pyscf/tests/test_dft_ecp.py:56-57)."""
    with pytest.warns(UserWarning, match="GENERATED"):
        mol = Molecule.from_atom_string(
            "Na 0 0 0; H 0 0 1.89", basis="sto-3g", ecp="jqc-model"
        )
    assert mol.nelectron == 2
    np.testing.assert_allclose(mol.atom_charges_eff, [1.0, 1.0])

    from joltqc_tpu.scf import RHF

    mf = RHF(mol, conv_tol=1e-10, max_cycle=60)
    e = mf.kernel()
    assert mf.converged
    # oracle anchor computed by an all-numpy RHF (dense ERIs + DIIS +
    # quadrature ECP matrix), conv_tol 1e-11 -- engine-independent
    np.testing.assert_allclose(e, -0.7088327233, atol=5e-8)
