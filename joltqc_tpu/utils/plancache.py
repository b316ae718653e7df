"""Persistent task-plan cache for the J/K engine.

The screened task plan is density-independent numpy data for a given
(molecule, basis, cutoffs, density-bound array) key, but building it
costs ~500 s of single-core host time at 513 AOs (the pair-class double
loop + native screen + per-tier sort/pad/reshape in
scf/jk_contracted.py::_build_plan).  The reference pays an analogous
cost on the GPU every iteration (screen_jk_tasks.cu) because atomic
queues are cheap there; on TPU the plan is static across the SCF, so it
can equally be static across *processes* -- this module persists built
plans to disk so a benchmark or SCF re-run pays the plan build once per
(workload, density-bound) rather than once per process.

Storage: one .npz per plan under ``~/.cache/joltqc_tpu/plans`` (override
base with JQC_CACHE_DIR; disable with JQC_PLAN_CACHE=0), holding every
entry's task index arrays plus a JSON header with the entry metadata and
plan statistics.  The key hashes everything the plan depends on: the
shell-class tables (geometry + basis), engine config (cutoffs, nprim
merging, accumulation strategy, tile, device count), the density-bound
inputs (logdm, dm_cond_log bytes, omega), and the autotune chunk table.
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np

PLAN_VERSION = 4  # bump on any change to the plan entry format
# v4: pad tasks index the in-range zero-coef pad shell (nshell-1) --
# v<=3 plans carry out-of-range pad indices whose gathers produce NaN
# geometry under jnp.take's fill semantics (the r3 tile parity bug).


def _cache_dir() -> str | None:
    if os.environ.get("JQC_PLAN_CACHE", "1") in ("0", "off", "none"):
        return None
    base = os.environ.get(
        "JQC_CACHE_DIR", os.path.expanduser("~/.cache/joltqc_tpu")
    )
    if base in ("0", "off", "none"):
        return None
    base = base.rstrip("/")
    if base.endswith("/xla"):
        base = base[:-4]
    return os.path.join(base, "plans")


def plan_key(engine, logdm: float, dm_cond_log, omega: float) -> str | None:
    """Content hash of every plan input, or None when caching is off."""
    if _cache_dir() is None:
        return None
    h = hashlib.sha256()
    h.update(f"v{PLAN_VERSION}".encode())
    # chunk-size choice is backend-aware (Pallas-eligibility ladder on
    # TPU), so plans must not be shared across backends
    import jax

    h.update(jax.default_backend().encode())
    for c in engine.classes:
        h.update(np.int64([c.l, c.nprim, c.nshell]).tobytes())
        for a in (c.coords, c.exps, c.coefs, c.ao, c.shell_ids):
            h.update(np.ascontiguousarray(a).tobytes())
    # "auto" accumulation with no block-tuned classes builds the exact
    # same plan as "scatter": normalize the tag so the (GB-scale) plan
    # file is shared rather than duplicated
    from .autotune import load_table

    accum_tag = engine.accum
    if accum_tag == "auto" and not any(
        isinstance(v, dict) and v.get("accum") == "block"
        for v in load_table().values()
    ):
        accum_tag = "scatter"
    h.update(
        json.dumps(
            [
                engine.cutoff_fp32,
                engine.cutoff_fp64,
                engine.merge_nprim,
                accum_tag,
                engine.tile,
                # tile plans group tasks into (tile_w-shell)^4 supertiles;
                # two engines differing only in tile_w must NOT share one
                engine.tile_w,
                engine._ndev,
                round(float(logdm), 9),
                float(omega or 0.0),
            ]
        ).encode()
    )
    if dm_cond_log is not None:
        h.update(np.ascontiguousarray(dm_cond_log, np.float32).tobytes())
    else:
        h.update(b"nocond")
    # chunk sizes come from the per-device autotune table when present
    from .autotune import load_table

    h.update(json.dumps(load_table(), sort_keys=True).encode())
    return h.hexdigest()[:32]


def save_plan(key: str, plan: list[dict], stats: dict) -> None:
    d = _cache_dir()
    if d is None or key is None:
        return
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, f"plan_{key}.npz")
    if os.path.exists(path):
        return
    arrays = {}
    meta = {"stats": stats, "entries": []}
    for i, e in enumerate(plan):
        ent = {
            "ls": list(e["ls"]),
            "nprims": list(e["nprims"]),
            "tier": e["tier"],
            "ntasks": int(e["ntasks"]),
            "cls_idx": list(e["cls_idx"]),
            "bound": float(e["bound"]),
            "accum": e.get("accum", "scatter"),
            "nrows": int(e.get("nrows", 0)),
            "n_tasks_arrays": len(e["tasks"]),
        }
        meta["entries"].append(ent)
        for j, a in enumerate(e["tasks"]):
            arrays[f"e{i}_t{j}"] = np.asarray(a)
    tmp = path + f".tmp{os.getpid()}"
    try:
        with open(tmp, "wb") as f:
            np.savez(f, _meta=np.frombuffer(
                json.dumps(meta).encode(), np.uint8), **arrays)
        os.replace(tmp, path)
    except OSError:
        try:
            os.remove(tmp)
        except OSError:
            pass


def load_plan(key: str):
    """(plan, stats) with numpy task arrays, or None on miss."""
    d = _cache_dir()
    if d is None or key is None:
        return None
    path = os.path.join(d, f"plan_{key}.npz")
    if not os.path.exists(path):
        return None
    try:
        with np.load(path) as z:
            meta = json.loads(bytes(z["_meta"]).decode())
            plan = []
            for i, ent in enumerate(meta["entries"]):
                tasks = tuple(
                    z[f"e{i}_t{j}"] for j in range(ent["n_tasks_arrays"])
                )
                plan.append(
                    dict(
                        ls=tuple(ent["ls"]),
                        nprims=tuple(ent["nprims"]),
                        tier=ent["tier"],
                        ntasks=ent["ntasks"],
                        cls_idx=tuple(ent["cls_idx"]),
                        tasks=tasks,
                        bound=float(ent["bound"]),
                        accum=ent["accum"],
                        nrows=ent["nrows"],
                    )
                )
        return plan, meta["stats"]
    except Exception:
        return None


__all__ = ["plan_key", "save_plan", "load_plan", "PLAN_VERSION"]
