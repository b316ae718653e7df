"""Headline benchmark: J/K Fock-build seconds per SCF iteration.

Workload: (H2O)27 cluster, 6-31g* (513 cartesian-internal AOs, 486
spherical), mixed precision (cutoff_fp32=1e-13, cutoff_fp64=1e-6 -- the
reference's default scheme, /root/reference/jqc/pyscf/__init__.py:
100-118), per-shell-block density screening.  Metric is the wall time
of a full get_jk call (vj+vk) with a converged-like density, after one
warmup call that triggers all kernel compiles -- the per-iteration
Fock-build cost that dominates SCF time-to-solution (BASELINE.json
north star).

Budget engineering (round-2 failure was rc=124, no number):
 - the screened task plan (the ~500 s single-core host build) is
   persisted to disk by the engine (utils/plancache.py) -- the first
   run of a round pays it, every later run loads it in seconds;
 - XLA kernel compiles hit the persistent compilation cache
   (utils/cache.py) when bench.py has been run once after the final
   source edit of the round;
 - the ONE JSON metric line is printed (and flushed) immediately after
   the FIRST timed run -- a slow tunnel then degrades precision, never
   existence; later runs only refine the stderr diagnostics.

Prints ONE JSON line:
  {"metric": ..., "value": seconds, "unit": "s", "vs_baseline": speedup}

vs_baseline anchor (documented derivation; no directly comparable
published number exists): BASELINE.md's GPU4PySCF v1.4.0 baseline runs
wB97M-V/def2-TZVPD SCF at 839 AOs in 429.6 s on an RTX 5090
(benchmarks/media JSONs).  Assuming ~20 SCF iterations and ~50% of the
per-iteration cost in the JK build, that is ~10.7 s/iter of JK at 839
AOs; scaling by (513/839)^3 (screened-ERI regime) gives

    ANCHOR_SEC = 10.7 * (513/839)**3 = 2.45 s/iter

for a GPU4PySCF-class JK build on this workload.  vs_baseline =
ANCHOR_SEC / value (higher is better; >1 means faster than the derived
GPU4PySCF anchor).  Diagnostics (tasks/s, tier split, warmup) go to
stderr.
"""

import json
import os
import sys
import time

import numpy as np

ANCHOR_SEC = 10.7 * (513.0 / 839.0) ** 3  # see module docstring

_T0 = time.time()


def log(msg):
    print(f"# [{time.time() - _T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


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
    from joltqc_tpu.scf.jk_contracted import JKEngine

    n_waters = int(os.environ.get("JQC_BENCH_WATERS", "27"))
    n_runs = int(os.environ.get("JQC_BENCH_RUNS", "3"))
    mol = Molecule.from_atom_string(water_cluster(n_waters), basis="6-31g*")
    log(f"molecule built: {mol.natm} atoms, nao={mol.nao}")
    mf = RHF(mol)
    # merged nprim buckets: ~21 quartet classes instead of ~120 -> the
    # compile count (the expensive resource through the PJRT tunnel)
    # stays bounded; padded-prim waste is acceptable at this size
    mf.jk = JKEngine(mf.layout, merge_nprim=True)

    # converged-like density: core-Hamiltonian guess.  hcore/ovlp are
    # deterministic for the workload but cost ~20 min of int1e compiles
    # through a slow tunnel, so the GUESS DENSITY (not the metric -- the
    # metric is the J/K build below) is persisted across runs.
    cache_dir = os.path.expanduser(
        os.environ.get("JQC_CACHE_DIR", "~/.cache/joltqc_tpu")
    )
    dm_path = os.path.join(
        cache_dir, f"bench_dm_w{n_waters}_{mol.nao}.npy"
    )
    if os.path.exists(dm_path):
        dm = np.load(dm_path)
        log("guess density loaded from cache")
    else:
        s = mf.get_ovlp()
        h = mf.get_hcore()
        log("hcore/ovlp done")
        dm = mf.init_guess(s, h)
        log("init guess done")
        try:
            os.makedirs(cache_dir, exist_ok=True)
            np.save(dm_path, np.asarray(dm))
        except OSError:
            pass

    # warmup: plan build (or disk-cache load) + kernel compiles.
    # Phase-split logging (r5): the warm-start floor is ~1800 s through
    # the tunnel; attributing it (plan load vs device upload + trace +
    # compile-cache fetch) is what decides where to optimize.
    t0 = time.time()
    mf.jk.build_plan(dm)
    log(f"plan ready (build or disk load): {time.time() - t0:.1f}s")
    t0 = time.time()
    vj, vk = mf.jk.get_jk(dm)
    warmup = time.time() - t0
    log(f"warmup(upload+trace+compile+run) done: {warmup:.1f}s")

    stats = getattr(mf.jk, "plan_stats", {})
    ntasks = stats.get("ntasks", 0)

    times = []
    emitted = False
    for r in range(max(n_runs, 1)):
        t0 = time.time()
        vj, vk = mf.jk.get_jk(dm)
        times.append(time.time() - t0)
        log(f"run {r + 1}: {times[-1]:.3f}s")
        if not emitted:
            # emit the metric line NOW: a timeout after this point still
            # yields a parsable result
            value = times[0]
            print(
                json.dumps(
                    {
                        "metric": f"jk_fock_build_sec_iter[(H2O){n_waters},"
                        f"6-31g*,{mol.nao}ao,mixed]",
                        "value": round(value, 4),
                        "unit": "s",
                        "vs_baseline": round(ANCHOR_SEC / value, 3),
                    }
                ),
                flush=True,
            )
            emitted = True

    value = float(np.median(times))
    log(
        f"median: {value:.3f}s  vs_baseline={ANCHOR_SEC / value:.3f}  "
        f"runs={[round(t, 3) for t in times]}  nao={mol.nao}  "
        f"ntasks={ntasks} (df64 {stats.get('n64', 0)})  "
        f"tasks/s={ntasks / value / 1e6:.2f}M  "
        f"classes={len(getattr(mf.jk, '_plan', []) or [])}"
    )


if __name__ == "__main__":
    main()
