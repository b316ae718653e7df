"""Per-class throughput table for the headline bench workload.

Loads the same engine + plan as bench.py (disk plan cache + persistent
XLA cache make this cheap once bench.py has run), times every class scan
at its plan shape with the in-jit + device->host-transfer harness
(utils/autotune.py::_time_class -- block_until_ready does not block on
the axon platform, CLAUDE.md), and writes a JSON table

    {"<ls>|<nprims>|<tier>": {"accum": ..., "ntasks": N,
                              "mtasks_per_s": X, "chunk": B}}

The committed snapshots (benchmarks/perf_r{N}.json) make per-class perf
regressions diffable between rounds (VERDICT r3 item 10; the reference
analogue is the benchmark JSONs under
/root/reference/benchmarks/media/).

Usage:  python benchmarks/profile_classes.py [out.json]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import water_cluster  # noqa: E402


def main():
    from joltqc_tpu.mol import Molecule
    from joltqc_tpu.scf import RHF
    from joltqc_tpu.scf.jk_contracted import JKEngine
    from joltqc_tpu.utils.autotune import _key, _time_class

    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    n_waters = int(os.environ.get("JQC_BENCH_WATERS", "27"))
    max_chunks = int(os.environ.get("JQC_PROF_CHUNKS", "4"))
    mol = Molecule.from_atom_string(water_cluster(n_waters), basis="6-31g*")
    mf = RHF(mol)
    mf.jk = JKEngine(mf.layout, merge_nprim=True)

    cache_dir = os.path.expanduser(
        os.environ.get("JQC_CACHE_DIR", "~/.cache/joltqc_tpu")
    )
    dm_path = os.path.join(cache_dir, f"bench_dm_w{n_waters}_{mol.nao}.npy")
    if os.path.exists(dm_path):
        dm = np.load(dm_path)
    else:
        dm = mf.init_guess(mf.get_ovlp(), mf.get_hcore())

    t0 = time.time()
    mf.jk.get_jk(dm)  # build/load plan + compile
    print(f"# warmup {time.time() - t0:.1f}s", file=sys.stderr, flush=True)

    table = {}
    entries = sorted(
        mf.jk._plan,
        key=lambda e: -e["ntasks"]
        * int(np.prod([(l + 1) * (l + 2) // 2 for l in e["ls"]])),
    )
    for e in entries:
        if e["ntasks"] < 256:
            continue
        key = _key(e["ls"], e["nprims"], e["tier"])
        try:
            spt = _time_class(mf.jk, e, None, max_chunks=max_chunks)
        except Exception as ex:  # noqa: BLE001
            print(f"# {key}: FAILED {ex!r}", file=sys.stderr, flush=True)
            continue
        shape = np.asarray(e["tasks"][0]).shape
        rec = {
            "accum": e.get("accum", "scatter"),
            "ntasks": int(e["ntasks"]),
            "chunk": int(shape[1]),
            # supertile-grouping pad overhead: padded slots / real tasks
            "pad_ratio": round(shape[0] * shape[1] / max(e["ntasks"], 1), 2),
            "mtasks_per_s": round(1e-6 / spt, 3),
        }
        table[key] = rec
        print(f"{key:40s} {rec['accum']:8s} {rec['mtasks_per_s']:9.2f} Mt/s",
              file=sys.stderr, flush=True)

    doc = {
        "workload": f"(H2O){n_waters}/6-31g*/{mol.nao}ao",
        "device": __import__("jax").devices()[0].device_kind,
        "classes": table,
    }
    text = json.dumps(doc, indent=1, sort_keys=True)
    if out_path:
        with open(out_path, "w") as f:
            f.write(text + "\n")
    else:
        print(text)


if __name__ == "__main__":
    main()
