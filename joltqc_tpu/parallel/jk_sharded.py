"""Task-sharded J/K Fock build over a jax.sharding.Mesh.

Parallel decomposition (TPU-native; no counterpart in the reference,
which is single-GPU -- /root/reference/README.md:104):

 - axis ``tasks``: shell-quartet task batches are split along the
   within-chunk batch dimension of every class scan (pure data
   parallelism -- ERI tasks are independent).
 - the density matrix is replicated (it is O(nao^2), tiny next to the
   O(ntasks) ERI work).
 - each device accumulates its partial Fock into int32 fixed-point
   limbs (ops/accum.py), which are reduced with ``jax.lax.psum`` --
   integer adds are exactly associative, so the multi-chip result is
   bit-identical to single-chip
   (tests/test_parallel.py::test_sharded_production_engine_bit_exact).

The implementation lives in the PRODUCTION engine: construct
``scf.jk_contracted.JKEngine`` with ``mesh=``, and every class scan is
shard_map'd over the mesh with the psum placed inside the limb domain
(scf/jk_contracted.py::_class_scan_sharded_fn).  This module is the
public entry point for that path.
"""

from __future__ import annotations

import numpy as np
from jax.sharding import Mesh


def task_mesh(devices=None, axis: str = "tasks") -> Mesh:
    """A 1-D device mesh over the task axis (all devices by default)."""
    import jax

    devs = np.array(devices if devices is not None else jax.devices())
    return Mesh(devs, (axis,))


def sharded_jk_engine(layout, mesh: Mesh | None = None, **kw):
    """Production mixed-precision JK engine sharded over ``mesh``.

    Returns ``scf.jk_contracted.JKEngine(layout, mesh=mesh, **kw)`` --
    the same engine, plans, and accumulation as single-chip; each class
    scan's within-chunk batch is split over the mesh and reduced with an
    exact integer-limb psum, so ``get_jk`` is bit-identical to the
    single-device result on any mesh partitioning.
    """
    from ..scf.jk_contracted import JKEngine

    return JKEngine(layout, mesh=mesh if mesh is not None else task_mesh(),
                    **kw)


__all__ = ["sharded_jk_engine", "task_mesh"]
