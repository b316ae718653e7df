"""Separate coarse VV10 grid (RKS nlcgrids) vs the shared-grid path.

Reference protocol: mf.nlcgrids.level = 2 with mf.grids.level = 5
(/root/reference/jqc/pyscf/tests/test_dft.py:31,56).  With nlcgrids set
to the SAME grid object as the main grid, the separate-grid code path
must reproduce the historical shared-grid result exactly (same
quadrature, same VV10 kernel, different assembly route); with a coarser
grid the energy must agree to VV10's quadrature insensitivity (~1e-5).
"""

import numpy as np
import pytest

from joltqc_tpu.dft.grids import Grids
from joltqc_tpu.mol import Molecule
from joltqc_tpu.scf import RKS

H2O = "O 0 0 0.1174; H -0.757 0 -0.4696; H 0.757 0 -0.4696"


@pytest.mark.slow
def test_nlcgrids_same_grid_matches_shared_path():
    mol = Molecule.from_atom_string(H2O)
    grids = Grids(mol, n_rad=40, n_ang=110).build()
    e_shared = RKS(
        mol, xc="wb97x-v", grids=grids, conv_tol=1e-9, max_cycle=40
    ).kernel()
    e_sep = RKS(
        mol, xc="wb97x-v", grids=grids, nlcgrids=grids,
        conv_tol=1e-9, max_cycle=40,
    ).kernel()
    # same quadrature on both routes: differences only from assembly
    # order / f32 numint tier noise
    assert abs(e_sep - e_shared) < 5e-7, (e_sep, e_shared)


@pytest.mark.slow
def test_nlcgrids_coarse_grid_close():
    mol = Molecule.from_atom_string(H2O)
    grids = Grids(mol, n_rad=40, n_ang=110).build()
    coarse = Grids(mol, n_rad=30, n_ang=50).build()
    e_shared = RKS(
        mol, xc="wb97x-v", grids=grids, conv_tol=1e-9, max_cycle=40
    ).kernel()
    e_sep = RKS(
        mol, xc="wb97x-v", grids=grids, nlcgrids=coarse,
        conv_tol=1e-9, max_cycle=40,
    ).kernel()
    assert abs(e_sep - e_shared) < 5e-5, (e_sep, e_shared)
    # nlc contribution itself is nonzero (the path actually ran)
    e_novv = RKS(
        mol, xc="wb97x-v", grids=grids, nlc=False,
        conv_tol=1e-9, max_cycle=40,
    ).kernel()
    assert abs(e_shared - e_novv) > 1e-4
