"""Geometry-scan workflow: reset/as_scanner reuse compiled kernels.

Reference counterpart: /root/reference/jqc/pyscf/tests/test_geom_opt.py
(reset/scanner re-application after geometry changes)."""

import numpy as np
import pytest

from joltqc_tpu.mol import Molecule
from joltqc_tpu.scf import RHF


def _h2o(r):
    return Molecule.from_atom_string(
        f"O 0 0 0.1174; H {-r} 0 -0.4696; H {r} 0 -0.4696", basis="sto-3g"
    )


@pytest.mark.slow
def test_scanner_matches_fresh_objects():
    scan = RHF(_h2o(0.757), conv_tol=1e-10).as_scanner()
    es = [scan(_h2o(r)) for r in (0.70, 0.757, 0.82)]
    for r, e in zip((0.70, 0.757, 0.82), es):
        mf = RHF(_h2o(r), conv_tol=1e-10)
        e_fresh = mf.kernel()
        assert abs(e - e_fresh) < 1e-8, (r, e, e_fresh)
    # equilibrium-ish point is the lowest of the three
    assert es[1] < es[0] and es[1] < es[2]
