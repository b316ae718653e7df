"""Shared benchmark helpers (reference counterpart:
/root/reference/benchmarks/benchmark_scf.py's molecule/timing harness)."""

from __future__ import annotations

import json
import time

import numpy as np


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


def glycine_chain(n: int) -> str:
    """Crude poly-glycine-like chain of n heavy-atom units (benchmark
    geometry only -- not a physical conformer)."""
    atoms = []
    for i in range(n):
        x = 1.45 * i
        z = 0.35 * (-1) ** i
        sym = ["C", "C", "N", "O"][i % 4]
        atoms.append(f"{sym} {x} 0 {z}")
        atoms.append(f"H {x} 0.95 {z + 0.4}")
    return "; ".join(atoms)


def timeit(fn, warmup: int = 1, repeats: int = 3):
    """(median_seconds, all_times) after warmup calls."""
    for _ in range(warmup):
        fn()
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), ts


def report(tag: str, **fields):
    print(json.dumps({"benchmark": tag, **fields}))
