"""Autotune the 513-AO bench workload on the current device.

Builds the bench engine twice (accum="scatter" and accum="block" -- both
plans come from the disk plan cache after one bench.py run), times every
class across chunk sizes AND against the block accumulator, and writes
~/.cache/joltqc_tpu/autotune_<device>.json (VERDICT r2 items 2/4: the
analogue of the reference's per-device optimal_scheme files,
/root/reference/jqc/backend/data/).

Run AFTER `python bench.py` has completed once (plan + dm caches warm):

    PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/tune_bench.py

The next bench.py run (accum="auto" engines) picks the table up and
rebuilds its plan with per-class accumulation routing.
"""
import os
import sys
import time

import numpy as np


def main():
    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    from bench import water_cluster

    from joltqc_tpu.mol import Molecule
    from joltqc_tpu.scf import RHF
    from joltqc_tpu.scf.jk_contracted import JKEngine
    from joltqc_tpu.utils.autotune import tune_workload

    n_waters = int(os.environ.get("JQC_BENCH_WATERS", "27"))
    mol = Molecule.from_atom_string(water_cluster(n_waters), basis="6-31g*")
    mf = RHF(mol)

    cache_dir = os.path.expanduser(
        os.environ.get("JQC_CACHE_DIR", "~/.cache/joltqc_tpu")
    )
    dm_path = os.path.join(cache_dir, f"bench_dm_w{n_waters}_{mol.nao}.npy")
    if os.path.exists(dm_path):
        dm = np.load(dm_path)
    else:
        dm = mf.init_guess(mf.get_ovlp(), mf.get_hcore())

    t0 = time.time()
    eng_s = JKEngine(mf.layout, merge_nprim=True, accum="scatter")
    eng_s.build_plan(dm)
    print(f"scatter plan ready ({time.time()-t0:.0f}s)", flush=True)
    t0 = time.time()
    eng_b = JKEngine(mf.layout, merge_nprim=True, accum="block")
    eng_b.build_plan(dm)
    print(f"block plan ready ({time.time()-t0:.0f}s)", flush=True)

    budget = float(os.environ.get("JQC_TUNE_BUDGET_S", "1800"))
    table = tune_workload(
        eng_s, min_tasks=4096, block_engine=eng_b,
        accum_only=os.environ.get("JQC_TUNE_ACCUM_ONLY", "1") == "1",
        max_chunks=int(os.environ.get("JQC_TUNE_MAX_CHUNKS", "4")),
        budget_s=budget,
    )
    nblock = sum(
        1 for v in table.values()
        if isinstance(v, dict) and v.get("accum") == "block"
    )
    print(f"table: {len(table)} entries, {nblock} routed to block accum",
          flush=True)


if __name__ == "__main__":
    main()
