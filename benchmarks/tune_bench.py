"""Measure tile-vs-scatter accumulation per class on the bench workload
and write the per-device autotune table.

This is the analogue of the reference's shipped per-device scheme files
(/root/reference/jqc/backend/data/optimal_scheme_*.json, consumed by
jqc/backend/jk.py:38-53): the winning {chunk, accum} per class is
written to ~/.cache/joltqc_tpu/autotune_<device>.json AND printed so it
can be committed to joltqc_tpu/data/ (the loader merges repo table +
user cache, utils/autotune.py::load_table).

Both strategies are timed from the ONE warm engine: ``_time_class(e,
None)`` times the plan's own (tile) layout, ``_time_class(e, B)``
rebuilds the same tasks at chunk B with the per-element scatter path.

Usage: python benchmarks/tune_bench.py [top_k]
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import water_cluster  # noqa: E402


def main():
    from joltqc_tpu.mol import Molecule
    from joltqc_tpu.scf import RHF
    from joltqc_tpu.scf.jk_contracted import JKEngine
    from joltqc_tpu.utils.autotune import (
        _device_name,
        _key,
        _table_path,
        _time_class,
        load_table,
    )

    top_k = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    max_chunks = int(os.environ.get("JQC_PROF_CHUNKS", "4"))
    n_waters = int(os.environ.get("JQC_BENCH_WATERS", "27"))
    mol = Molecule.from_atom_string(water_cluster(n_waters), basis="6-31g*")
    mf = RHF(mol)
    mf.jk = JKEngine(mf.layout, merge_nprim=True)

    cache_dir = os.path.expanduser(
        os.environ.get("JQC_CACHE_DIR", "~/.cache/joltqc_tpu")
    )
    dm_path = os.path.join(cache_dir, f"bench_dm_w{n_waters}_{mol.nao}.npy")
    dm = (
        np.load(dm_path)
        if os.path.exists(dm_path)
        else mf.init_guess(mf.get_ovlp(), mf.get_hcore())
    )
    mf.jk.get_jk(dm)  # plan + compiles (disk/XLA caches make this warm)

    entries = sorted(
        mf.jk._plan,
        key=lambda e: -e["ntasks"]
        * int(np.prod([(l + 1) * (l + 2) // 2 for l in e["ls"]])),
    )[:top_k]

    from joltqc_tpu.scf.jk_contracted import _chunk_size

    budget_s = float(os.environ.get("JQC_TUNE_BUDGET_S", "0")) or None
    t_start = __import__("time").perf_counter()
    os.makedirs(os.path.dirname(_table_path()), exist_ok=True)
    table = dict(load_table())
    for e in entries:
        if budget_s and __import__("time").perf_counter() - t_start > budget_s:
            print("# tune budget spent -- writing partial table",
                  file=sys.stderr, flush=True)
            break
        key = _key(e["ls"], e["nprims"], e["tier"])
        B = int(np.asarray(e["tasks"][0]).shape[1])
        accum_plan = e.get("accum", "scatter")
        t_plan = _time_class(mf.jk, e, None, max_chunks=max_chunks)
        rec = {"chunk": B, "accum": accum_plan,
               "mtasks_per_s": round(1e-6 / t_plan, 3)}
        if accum_plan != "scatter":
            # time scatter at its OWN ladder/heuristic chunk, not the
            # tile plan's supertile-sized B (ADVICE r4: chunk mismatch
            # biased the comparison); _time_class normalizes both by
            # real (non-pad) tasks.
            B_sc = _chunk_size(e["ls"], e["ntasks"], nprims=e["nprims"],
                               tier=e["tier"])
            try:
                t_sc = _time_class(mf.jk, e, B_sc, max_chunks=max_chunks)
            except Exception as ex:  # noqa: BLE001
                print(f"# {key}: scatter timing failed {ex!r}",
                      file=sys.stderr, flush=True)
                t_sc = np.inf
            print(
                f"{key:40s} {accum_plan}={1e-6 / t_plan:8.2f} "
                f"scatter(B={B_sc})={1e-6 / t_sc:8.2f} Mt/s",
                file=sys.stderr, flush=True,
            )
            if t_sc < t_plan:
                rec = {"chunk": B_sc, "accum": "scatter",
                       "mtasks_per_s": round(1e-6 / t_sc, 3)}
        else:
            print(f"{key:40s} scatter={1e-6 / t_plan:8.2f} Mt/s",
                  file=sys.stderr, flush=True)
        table[key] = rec
        # persist incrementally: a tunnel stall mid-tune still leaves a
        # usable partial table
        with open(_table_path(), "w") as f:
            json.dump(table, f, indent=1, sort_keys=True)

    path = _table_path()
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(table, f, indent=1, sort_keys=True)
    print(f"# wrote {path}", file=sys.stderr, flush=True)
    print(json.dumps({"device": _device_name(), "table": table}, indent=1,
                     sort_keys=True))


if __name__ == "__main__":
    main()
