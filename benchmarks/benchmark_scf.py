"""End-to-end SCF time-to-solution (RHF + RKS families).

Reference counterpart: /root/reference/benchmarks/benchmark_scf.py and
the wB97M-V molecule suite (benchmark_wb97mv_molecules_jqc.py).

Usage: python benchmarks/benchmark_scf.py [nwaters] [xc ...]
"""

import sys
import time

from common import report, water_cluster

from joltqc_tpu.mol import Molecule
from joltqc_tpu.scf import RHF, RKS


def main(n, xcs):
    mol = Molecule.from_atom_string(water_cluster(n), basis="6-31g")
    for xc in xcs:
        t0 = time.perf_counter()
        if xc == "hf":
            mf = RHF(mol, conv_tol=1e-9)
        else:
            mf = RKS(mol, xc=xc, conv_tol=1e-9)
        e = mf.kernel()
        report(
            "scf",
            nwaters=n,
            nao=mol.nao,
            xc=xc,
            e_tot=round(e, 10),
            converged=mf.converged,
            cycles=mf.scf_summary.get("cycles"),
            wall_sec=round(time.perf_counter() - t0, 2),
            jk_sec=round(mf.scf_summary.get("jk_time", 0.0), 2),
        )


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    xcs = sys.argv[2:] or ["hf", "pbe", "b3lyp", "wb97x-v"]
    main(n, xcs)
