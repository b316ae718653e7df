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


def _h2_mol(r):
    return Molecule.from_atom_string(
        f"H 0 0 0; H 0 0 {r}", basis="sto-3g"
    )


@pytest.mark.slow
def test_geometry_optimization_fd_gradient():
    """Naive optimization loop driving reset/plan-reuse across many
    geometries (reference workflow: test_geom_opt.py:20-186 drives a
    geomeTRIC optimization through the patched kernels).  H2/sto-3g:
    steepest descent on finite-difference gradients of the scanner
    energy must converge to the known equilibrium bond length."""
    scan = RHF(_h2_mol(1.2), conv_tol=1e-11).as_scanner()
    r = 1.2  # start well away from equilibrium (Angstrom)
    h = 1e-3
    evals = 0
    for it in range(40):
        gplus = scan(_h2_mol(r + h))
        gminus = scan(_h2_mol(r - h))
        evals += 2
        grad = (gplus - gminus) / (2 * h)
        step = -0.5 * grad
        step = float(np.clip(step, -0.1, 0.1))
        r += step
        if abs(grad) < 2e-5:
            break
    # RHF/STO-3G H2 equilibrium bond length ~ 0.712 Angstrom
    assert abs(r - 0.712) < 5e-3, r
    e_final = scan(_h2_mol(r))
    e_eq = RHF(_h2_mol(0.7122), conv_tol=1e-11).kernel()
    assert e_final < e_eq + 1e-6
    # scanner reuse: the optimization ran dozens of SCFs through ONE
    # driver object (compiled class kernels shared across geometries)
    assert evals >= 10
