"""Per-class chunk-size autotuner for the J/K engine.

Reference counterpart: the per-device fragmentation autotuner
(/root/reference/jqc/backend/data/generate_fragment.py) and the shipped
``optimal_scheme_{device}_{fp32,fp64}.json`` tables consumed by the
kernel router (jqc/backend/jk.py:38-53).  On TPU the tunable is the task
chunk size B of each class scan (the trade is VPU occupancy + scatter
width vs padding waste and VMEM pressure); the default is an analytic
heuristic (scf/jk_contracted.py:_chunk_size), and this module measures
real per-class throughput to override it.

Usage:
    from joltqc_tpu.utils.autotune import tune_workload, load_table
    tune_workload(engine)          # times every class in engine's plan
    # -> writes ~/.cache/joltqc_tpu/autotune_<device>.json
    # JKEngine picks the table up automatically on the next plan build.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

_TABLE = None
_TABLE_DEV = None


def _device_name() -> str:
    import jax

    d = jax.devices()[0]
    return f"{d.platform}_{getattr(d, 'device_kind', 'generic')}".replace(
        " ", "_"
    )


def _table_path(device: str | None = None) -> str:
    dev = device or _device_name()
    base = os.environ.get(
        "JQC_CACHE_DIR", os.path.expanduser("~/.cache/joltqc_tpu")
    )
    if base in ("0", "off", "none"):
        base = os.path.expanduser("~/.cache/joltqc_tpu")
    base = base.rstrip("/")
    if base.endswith("/xla"):
        base = base[:-4]
    return os.path.join(base, f"autotune_{dev}.json")


def load_table() -> dict:
    """{'(ls)|(nprims)|tier': chunk} for the current device ({} if none)."""
    global _TABLE, _TABLE_DEV
    dev = _device_name()
    if _TABLE is not None and _TABLE_DEV == dev:
        return _TABLE
    path = _table_path(dev)
    try:
        with open(path) as f:
            _TABLE = json.load(f)
    except (OSError, ValueError):
        _TABLE = {}
    _TABLE_DEV = dev
    return _TABLE


def _key(ls, nprims, tier) -> str:
    return f"{tuple(ls)}|{tuple(nprims)}|{tier}"


def tuned_chunk(ls, nprims, tier) -> int | None:
    """Tuned chunk size for a class, or None to use the heuristic."""
    return load_table().get(_key(ls, nprims, tier))


def _time_class(engine, entry, B: int, repeats: int = 3) -> float:
    """Seconds per task for one class at chunk size B (median of repeats)."""
    import jax
    import jax.numpy as jnp

    from ..ops import df64 as df
    from ..scf.jk_contracted import _class_scan_fn

    ls, nprims, tier = entry["ls"], entry["nprims"], entry["tier"]
    nao = engine.nao
    tables = engine._tables(tier)
    tbls = tuple(tables[k] for k in entry["cls_idx"])
    # rebuild this class's task list at chunk B (same tasks, new shape)
    flat = [np.asarray(t).reshape(-1) for t in entry["tasks"]]
    n = len(flat[0])
    npad = (-n) % B
    tasks = tuple(
        jnp.asarray(
            np.concatenate([f, np.full(npad, f[-1], f.dtype)]).reshape(-1, B)
        )
        for f in flat
    )
    dm = (
        df.const(0.5, (nao, nao))
        if tier in ("df64", "fp64")
        else jnp.full((nao, nao), 0.5, jnp.float32)
    )
    bound = jnp.asarray(np.float32(entry["bound"]))
    fn = _class_scan_fn(ls, nprims, tier, nao, True, True, 0.0, chunk_b=B)

    def run():
        vj = df.const(0.0, (nao * nao,))
        vk = df.const(0.0, (nao * nao,))
        vj, vk = fn(tbls, tasks, dm, vj, vk, bound)
        # force a device->host transfer: block_until_ready does not
        # actually block on the axon platform (CLAUDE.md measurement trap)
        np.asarray(vj.hi[:1])

    run()  # compile
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        run()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / max(n, 1)


def tune_workload(engine, sizes=(256, 512, 1024, 2048, 4096, 8192),
                  min_tasks: int = 256, verbose: bool = True) -> dict:
    """Time every class in the engine's current plan across chunk sizes.

    Writes the winning sizes to the per-device table and returns it.
    ``engine`` must have a built plan (call get_jk once first)."""
    global _TABLE
    if engine._plan is None:
        raise ValueError("engine has no plan yet -- run get_jk once first")
    table = dict(load_table())
    for entry in engine._plan:
        if entry["ntasks"] < min_tasks:
            continue
        key = _key(entry["ls"], entry["nprims"], entry["tier"])
        best, best_t = None, np.inf
        for B in sizes:
            if B > 4 * entry["ntasks"]:
                continue
            t = _time_class(engine, entry, B)
            if verbose:
                print(f"{key:36s} B={B:5d}  {t*1e9:8.1f} ns/task")
            if t < best_t:
                best, best_t = B, t
        if best is not None:
            table[key] = best
    path = _table_path()
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(table, f, indent=1, sort_keys=True)
    _TABLE = table
    if verbose:
        print(f"wrote {path} ({len(table)} entries)")
    return table


__all__ = ["tune_workload", "tuned_chunk", "load_table"]
