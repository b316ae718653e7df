"""End-to-end SCF time-to-solution (RHF + RKS families).

Reference counterpart: /root/reference/benchmarks/benchmark_scf.py and
the wB97M-V molecule suite (benchmark_wb97mv_molecules_jqc.py) -- the
north-star metric is a full SCF wall time on a real molecule, not a
JK-only iteration time.

Usage:
  python benchmarks/benchmark_scf.py [--waters N | --xyz path] \
      [--basis 6-31g] [--merge-nprim] [--incremental] [xc ...]

Examples:
  # headline-workload full SCF on the chip (reuses bench.py's warm
  # plan/XLA caches: same engine construction as bench.py)
  python benchmarks/benchmark_scf.py --waters 27 --basis "6-31g*" \
      --merge-nprim b3lyp
  # suite molecule
  python benchmarks/benchmark_scf.py \
      --xyz benchmarks/molecules/0040-tryptoline_derivative.xyz b3lyp
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from common import report, water_cluster  # noqa: E402

from joltqc_tpu.mol import Molecule  # noqa: E402
from joltqc_tpu.scf import RHF, RKS  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--waters", type=int, default=None)
    ap.add_argument("--xyz", type=str, default=None)
    ap.add_argument("--basis", type=str, default="6-31g")
    ap.add_argument("--merge-nprim", action="store_true")
    ap.add_argument("--incremental", action="store_true")
    ap.add_argument("--conv-tol", type=float, default=1e-8)
    ap.add_argument("--max-cycle", type=int, default=50)
    ap.add_argument("xcs", nargs="*", default=None)
    args = ap.parse_args()
    xcs = args.xcs or ["hf", "pbe", "b3lyp", "wb97x-v"]

    if args.xyz:
        mol = Molecule.from_xyz_file(args.xyz, basis=args.basis)
        label = os.path.basename(args.xyz)
    else:
        n = args.waters if args.waters is not None else 2
        mol = Molecule.from_atom_string(water_cluster(n), basis=args.basis)
        label = f"(H2O){n}"

    # hcore/ovlp are deterministic per workload and cost ~20 min of
    # device int1e through a slow tunnel at ~500 AO: disk-cache them
    # (same pattern as bench.py's guess-density cache)
    cache_dir = os.path.expanduser(
        os.environ.get("JQC_CACHE_DIR", "~/.cache/joltqc_tpu")
    )
    # content-hash the geometry + basis so a changed xyz/basis with the
    # same nao cannot silently load stale s/h (ADVICE r4)
    import hashlib

    import numpy as np

    ghash = hashlib.sha256(
        np.ascontiguousarray(mol.coords).tobytes()
        + ",".join(mol.atom_symbols).encode()
        + str(args.basis).encode()
    ).hexdigest()[:12]
    h_path = os.path.join(
        cache_dir,
        f"bench_sh_{label.replace('/', '_')}_{mol.nao}_{ghash}.npz",
    )
    sh = None
    if os.path.exists(h_path):
        z = __import__("numpy").load(h_path)
        sh = (z["s"], z["h"])

    for xc in xcs:
        t0 = time.perf_counter()
        kw = dict(conv_tol=args.conv_tol, max_cycle=args.max_cycle,
                  incremental=args.incremental)
        mf = RHF(mol, **kw) if xc == "hf" else RKS(mol, xc=xc, **kw)
        if args.merge_nprim:
            from joltqc_tpu.scf.jk_contracted import JKEngine

            mf.jk = JKEngine(mf.layout, merge_nprim=True)
        if sh is None:
            sh = (mf.get_ovlp(), mf.get_hcore())
            try:
                import numpy as _np

                os.makedirs(cache_dir, exist_ok=True)
                _np.savez(h_path, s=sh[0], h=sh[1])
            except OSError:
                pass
        mf.get_ovlp = lambda: sh[0]  # noqa: B023
        mf.get_hcore = lambda: sh[1]  # noqa: B023
        e = mf.kernel()
        report(
            "scf",
            molecule=label,
            natm=mol.natm,
            nao=mol.nao,
            basis=args.basis,
            xc=xc,
            e_tot=round(e, 10),
            converged=mf.converged,
            cycles=mf.scf_summary.get("cycles"),
            wall_sec=round(time.perf_counter() - t0, 2),
            jk_sec=round(mf.scf_summary.get("jk_time", 0.0), 2),
        )


if __name__ == "__main__":
    main()
