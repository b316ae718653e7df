"""J/K Fock-build throughput across system sizes and precision tiers.

Reference counterpart: /root/reference/benchmarks/benchmark_jk.py
(GPU4PySCF vs JQC FP64/FP32/mixed per kernel family).

Usage: python benchmarks/benchmark_jk.py [nwaters ...]
"""

import sys

import numpy as np

from common import report, timeit, water_cluster

from joltqc_tpu.mol import Molecule
from joltqc_tpu.mol.layout import BasisLayout
from joltqc_tpu.scf.jk_contracted import JKEngine

TIERS = {
    "mixed": dict(cutoff_fp32=1e-13, cutoff_fp64=1e-6),
    "df64": dict(cutoff_fp32=1e-13, cutoff_fp64=1e-30),
    "fp32": dict(cutoff_fp32=1e-13, cutoff_fp64=1e30),
}


def main(sizes):
    for n in sizes:
        mol = Molecule.from_atom_string(water_cluster(n), basis="6-31g")
        rng = np.random.default_rng(0)
        a = rng.uniform(-0.1, 0.1, (mol.nao, mol.nao))
        dm = a + a.T + np.eye(mol.nao)
        for tier, cfg in TIERS.items():
            eng = JKEngine(BasisLayout(mol), **cfg)
            t, ts = timeit(lambda: eng.get_jk(dm))
            ntasks = sum(e["ntasks"] for e in eng._plan)
            report(
                "jk_build",
                nwaters=n,
                nao=mol.nao,
                tier=tier,
                sec=round(t, 4),
                tasks=ntasks,
                tasks_per_sec=int(ntasks / t),
            )


if __name__ == "__main__":
    sizes = [int(x) for x in sys.argv[1:]] or [2, 4, 8]
    main(sizes)
