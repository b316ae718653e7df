"""Task-sharded J/K Fock build over a jax.sharding.Mesh.

Parallel decomposition (TPU-native; no counterpart in the reference,
which is single-GPU -- /root/reference/README.md:104):

 - axis ``tasks``: shell-quartet task batches are split along the batch
   dimension (pure data parallelism -- ERI tasks are independent).
 - the density matrix is replicated (it is O(nao^2), tiny next to the
   O(ntasks) ERI work).
 - each device scatter-accumulates its partial Fock into int32
   fixed-point limbs (ops/accum.py), which are reduced with
   ``jax.lax.psum`` -- integer adds are exactly associative, so the
   multi-chip result is bit-identical to single-chip.

The collective rides ICI via XLA; everything here is shape-static and
jit-compatible.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.6 exposes shard_map at top level
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map as _shard_map

from ..ops import df64 as df
from ..ops.accum import limbs_to_df64, scatter_limbs


def fock_step_spec(tier: str):
    """(in_specs, out_specs) for one sharded Fock-contribution step."""
    geom_spec = P("tasks")  # every geom leaf has the task batch as axis 0
    dm_spec = P()  # replicated
    return (geom_spec, dm_spec), P()


def build_sharded_jk_step(mesh: Mesh, ls, tier: str, nao: int,
                          with_j: bool = True, with_k: bool = True):
    """Return a jitted ``step(geom, dm) -> (vj, vk)`` sharded over ``mesh``.

    ``geom`` is the per-task geometry dict of the JK engine (see
    scf/jk.py:_jk_contrib_fn); its leading axis is sharded over the
    ``tasks`` mesh axis.  ``dm`` is replicated.  Outputs are replicated
    DF64 (nao*nao,) flattened Fock contributions (the same layout the
    single-chip engine accumulates into).
    """
    from ..scf.jk import _cat, _jk_contrib_fn

    contrib = _jk_contrib_fn(ls, tier, nao, with_j, with_k)

    def local_step(geom, dm):
        jvals, jidx, kvals, kidx = contrib(geom, dm)

        def reduce_scatter(vals, idx):
            joined = _cat(list(vals)) if len(vals) > 1 else vals[0]
            jix = jnp.concatenate(list(idx)) if len(idx) > 1 else idx[0]
            if not isinstance(joined, df.DF64):
                joined = df.from_f32(joined)
            # one scale across all shards so the int32 limbs are commensurable
            gmax = jax.lax.pmax(jnp.max(jnp.abs(joined.hi)), "tasks")
            limbs, sexp = scatter_limbs(joined, jix, nao * nao, x_abs_max=gmax)
            limbs = jax.lax.psum(limbs, "tasks")  # exact integer reduction
            return limbs_to_df64(limbs, sexp)

        vj = reduce_scatter(jvals, jidx) if with_j else None
        vk = reduce_scatter(kvals, kidx) if with_k else None
        return vj, vk

    (in_geom, in_dm), out = fock_step_spec(tier)
    sharded = _shard_map(
        local_step, mesh=mesh, in_specs=(in_geom, in_dm), out_specs=out,
        check_vma=False,
    )
    return jax.jit(sharded)


__all__ = ["build_sharded_jk_step", "fock_step_spec"]
