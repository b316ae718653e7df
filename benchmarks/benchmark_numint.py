"""Grid-integration (rho / V_xc) throughput, dense vs screened paths.

Reference counterpart: /root/reference/benchmarks/benchmark_numint.py,
benchmark_rho.py, benchmark_vxc.py.

Usage: python benchmarks/benchmark_numint.py [nwaters] [family]
"""

import sys

import numpy as np

from common import report, timeit, water_cluster

from joltqc_tpu.dft.grids import Grids
from joltqc_tpu.dft.numint import NumInt, eval_rho_all, eval_vxc_mat
from joltqc_tpu.dft.screening import (
    GridScreening,
    eval_rho_screened,
    eval_vxc_screened,
)
from joltqc_tpu.mol import Molecule
from joltqc_tpu.mol.layout import BasisLayout


def main(n, family):
    mol = Molecule.from_atom_string(water_cluster(n), basis="6-31g")
    layout = BasisLayout(mol)
    grids = Grids(mol).build()
    ni = NumInt(layout)
    rng = np.random.default_rng(0)
    d = rng.uniform(-0.1, 0.1, (layout.nao_int, layout.nao_int))
    dm = d + d.T + np.eye(layout.nao_int)
    rows = {"lda": 1, "gga": 4, "mgga": 5}[family]
    wv = rng.standard_normal((rows, len(grids.coords))) * grids.weights

    t_rho, _ = timeit(lambda: eval_rho_all(ni, grids, dm, family))
    t_vxc, _ = timeit(lambda: eval_vxc_mat(ni, grids, wv, family))
    report("numint_dense", nwaters=n, nao=layout.nao_int,
           ngrid=len(grids.coords), family=family,
           rho_sec=round(t_rho, 4), vxc_sec=round(t_vxc, 4))

    scr = GridScreening(ni, grids)
    t_rho_s, _ = timeit(lambda: eval_rho_screened(ni, scr, dm, family))
    t_vxc_s, _ = timeit(lambda: eval_vxc_screened(ni, scr, wv, family))
    report("numint_screened", nwaters=n, fill=round(scr.fill_fraction, 3),
           family=family, rho_sec=round(t_rho_s, 4),
           vxc_sec=round(t_vxc_s, 4))


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    family = sys.argv[2] if len(sys.argv) > 2 else "gga"
    main(n, family)
