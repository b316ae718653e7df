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
    """{'(ls)|(nprims)|tier': chunk} for the current device ({} if none).

    Resolution order: the repo-committed per-device table
    (joltqc_tpu/data/autotune_<device>.json -- the analogue of the
    reference's shipped optimal_scheme_*.json, jqc/backend/jk.py:38-53)
    is the base; a user-cache table (~/.cache/joltqc_tpu/) overrides
    per class."""
    global _TABLE, _TABLE_DEV
    dev = _device_name()
    if _TABLE is not None and _TABLE_DEV == dev:
        return _TABLE
    table = {}
    repo_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "data", f"autotune_{dev}.json",
    )
    for path in (repo_path, _table_path(dev)):
        try:
            with open(path) as f:
                table.update(json.load(f))
        except (OSError, ValueError):
            pass
    _TABLE = table
    _TABLE_DEV = dev
    return _TABLE


def _key(ls, nprims, tier) -> str:
    return f"{tuple(ls)}|{tuple(nprims)}|{tier}"


def tuned_chunk(ls, nprims, tier) -> int | None:
    """Tuned chunk size for a class, or None to use the heuristic."""
    v = load_table().get(_key(ls, nprims, tier))
    if isinstance(v, dict):
        return v.get("chunk")
    return v


def tuned_accum(ls, nprims, tier) -> str | None:
    """Tuned accumulation strategy ("scatter" | "block") or None."""
    v = load_table().get(_key(ls, nprims, tier))
    if isinstance(v, dict):
        return v.get("accum")
    return None


def _time_class(engine, entry, B: int | None, repeats: int = 3,
                outer: int = 4, max_chunks: int | None = None) -> float:
    """Seconds per task for one class at chunk size B (median of repeats).

    ``B=None`` runs the entry's tasks at their PLAN shape (required for
    block-grouped entries, whose (gslot, tb4) extras are chunk-layout
    bound).  ``outer`` async dispatches per timing amortize the PJRT
    tunnel round trip (CLAUDE.md measurement traps).  ``max_chunks``
    slices the timing to the first k chunks (the big bench classes run
    512 chunks -- timing the whole class x repeats x outer through the
    tunnel is minutes per class; a 4-chunk slice ranks strategies just
    as well)."""
    import jax
    import jax.numpy as jnp

    from ..ops import df64 as df
    from ..scf.jk_contracted import _class_scan_fn

    ls, nprims, tier = entry["ls"], entry["nprims"], entry["tier"]
    accum = entry.get("accum", "scatter") if B is None else "scatter"
    nao = engine.nao
    tables = engine._tables(tier)
    tbls = tuple(tables[k] for k in entry["cls_idx"])
    eoffs = None
    if accum == "tile":
        offs, E = engine._espace()
        eoffs = tuple(offs[k] for k in entry["cls_idx"])
    n = int(entry["ntasks"])
    if B is None:
        arrs = tuple(np.asarray(t) for t in entry["tasks"])
        B_eff = int(arrs[0].shape[1])
        if max_chunks is not None and arrs[0].shape[0] > max_chunks:
            arrs = tuple(a[:max_chunks] for a in arrs)
        # normalize by REAL tasks in the timed window (pad slots carry
        # weight 0) -- tile-grouped plans pad per supertile group, so a
        # nominal slot count would bias the tile-vs-scatter comparison
        # (ADVICE r4)
        n = int(np.count_nonzero(np.asarray(arrs[4], np.float32)))
        tasks = tuple(jnp.asarray(a) for a in arrs)
    else:
        # rebuild this class's task list at chunk B (same tasks, new
        # shape).  Pads replicate the last REAL task (not a zero-coef
        # pad shell) so per-task time stays conservative; count real
        # slots for normalization like the B=None branch.
        flat = [np.asarray(t).reshape(-1) for t in entry["tasks"][:5]]
        # keep real tasks only (pad slots -- pow2 tail or interleaved
        # tile-group padding -- carry weight 0)
        keep = flat[4] != 0.0
        flat = [f[keep] for f in flat]
        n = len(flat[0])
        npad = (-n) % B
        chunked = [
            np.concatenate([f, np.full(npad, f[-1], f.dtype)]).reshape(-1, B)
            for f in flat
        ]
        if max_chunks is not None and chunked[0].shape[0] > max_chunks:
            chunked = [c[:max_chunks] for c in chunked]
            n = min(n, max_chunks * B)
        tasks = tuple(jnp.asarray(c) for c in chunked)
        B_eff = B
    dm = (
        df.const(0.5, (nao, nao))
        if tier in ("df64", "fp64")
        else jnp.full((nao, nao), 0.5, jnp.float32)
    )
    bound = jnp.asarray(np.float32(entry["bound"]))
    fn = _class_scan_fn(
        ls, nprims, tier, nao, True, True, 0.0, accum=accum,
        nrows=entry.get("nrows", 0) if B is None else 0,
        tile=engine.tile, chunk_b=B_eff,
        eoffs=eoffs, tile_w=engine.tile_w,
    )
    acc_shape = (
        (engine._espace()[1],) * 2 if accum == "tile" else (nao * nao,)
    )

    def run():
        last = None
        for _ in range(outer):
            vj = df.const(0.0, acc_shape)
            vk = df.const(0.0, acc_shape)
            vj, vk = fn(tbls, tasks, dm, vj, vk, bound)
            last = vj
        # force a device->host transfer: block_until_ready does not
        # actually block on the axon platform (CLAUDE.md measurement trap)
        np.asarray(last.hi.reshape(-1)[:1])

    run()  # compile
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        run()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / max(n, 1) / outer


def tune_workload(engine, sizes=(256, 512, 1024, 2048, 4096, 8192),
                  min_tasks: int = 256, verbose: bool = True,
                  block_engine=None, tile_engine=None,
                  accum_only: bool = False,
                  max_chunks: int | None = 4,
                  budget_s: float | None = None) -> dict:
    """Time every class in the engine's current plan across chunk sizes.

    Writes the winning sizes to the per-device table and returns it.
    ``engine`` must have a built plan (call get_jk once first).

    ``block_engine``: optional second engine with ``accum='block'`` and a
    built plan on the same workload; block-grouped entries are timed
    against the scatter winner and the faster accumulation strategy is
    recorded per class (VERDICT r2 item 4: measured block-vs-scatter
    routing, the analogue of the reference's per-device scheme files).

    ``accum_only=True`` skips the chunk-size sweep (the plan's chunk --
    already ladder/table-routed -- is kept) and only decides
    scatter-vs-block per class.  ``budget_s`` stops tuning when the
    wall budget is spent (classes are visited in descending task-volume
    order, so the hottest classes are tuned first); the partial table is
    still written."""
    global _TABLE
    if engine._plan is None:
        raise ValueError("engine has no plan yet -- run get_jk once first")
    block_by_key = {}
    if block_engine is not None and block_engine._plan is not None:
        for e in block_engine._plan:
            if e.get("accum") == "block":
                block_by_key[_key(e["ls"], e["nprims"], e["tier"])] = e
    tile_by_key = {}
    if tile_engine is not None and tile_engine._plan is not None:
        for e in tile_engine._plan:
            if e.get("accum") == "tile":
                tile_by_key[_key(e["ls"], e["nprims"], e["tier"])] = e
    table = dict(load_table())
    t_start = time.perf_counter()
    entries = sorted(
        engine._plan,
        key=lambda e: -e["ntasks"] * int(
            np.prod([(l + 1) * (l + 2) // 2 for l in e["ls"]])
        ),
    )
    for entry in entries:
        if entry["ntasks"] < min_tasks:
            continue
        if budget_s is not None and time.perf_counter() - t_start > budget_s:
            if verbose:
                print("tune budget spent -- writing partial table",
                      flush=True)
            break
        key = _key(entry["ls"], entry["nprims"], entry["tier"])
        if accum_only:
            best = int(np.asarray(entry["tasks"][0]).shape[1])
            best_t = _time_class(engine, entry, None, max_chunks=max_chunks)
            if verbose:
                print(f"{key:36s} plan B={best:5d}  {best_t*1e9:8.1f} "
                      "ns/task", flush=True)
        else:
            best, best_t = None, np.inf
            for B in sizes:
                if B > 4 * entry["ntasks"]:
                    continue
                t = _time_class(engine, entry, B, max_chunks=max_chunks)
                if verbose:
                    print(f"{key:36s} B={B:5d}  {t*1e9:8.1f} ns/task",
                          flush=True)
                if t < best_t:
                    best, best_t = B, t
            if best is None:
                continue
        rec = {"chunk": best, "accum": "scatter"}
        blk = block_by_key.get(key)
        if blk is not None:
            t_blk = _time_class(block_engine, blk, None,
                                max_chunks=max_chunks)
            if verbose:
                print(f"{key:36s} block  {t_blk*1e9:8.1f} ns/task "
                      f"(scatter best {best_t*1e9:.1f})", flush=True)
            if t_blk < best_t:
                rec = {
                    "chunk": int(np.asarray(blk["tasks"][0]).shape[1]),
                    "accum": "block",
                }
                best_t = t_blk
        til = tile_by_key.get(key)
        if til is not None:
            t_til = _time_class(tile_engine, til, None,
                                max_chunks=max_chunks)
            if verbose:
                print(f"{key:36s} tile   {t_til*1e9:8.1f} ns/task "
                      f"(prev best {best_t*1e9:.1f})", flush=True)
            if t_til < best_t:
                rec = {
                    "chunk": int(np.asarray(til["tasks"][0]).shape[1]),
                    "accum": "tile",
                }
        table[key] = rec
    path = _table_path()
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(table, f, indent=1, sort_keys=True)
    _TABLE = table
    if verbose:
        print(f"wrote {path} ({len(table)} entries)")
    return table


__all__ = ["tune_workload", "tuned_chunk", "load_table"]
