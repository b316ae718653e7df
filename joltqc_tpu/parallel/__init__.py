"""Multi-chip parallelism: task-sharded Fock builds over a jax device mesh.

The reference is single-GPU only ("Multi-GPU is not supported yet",
/root/reference/README.md:104); this package is the TPU-native scaling
story it lacks: shell-quartet task batches are data-parallel, the density
matrix is replicated, and partial Fock contributions are reduced with an
exact integer-limb ``psum`` over ICI (see ops/accum.py).
"""

from .jk_sharded import build_sharded_jk_step, fock_step_spec

__all__ = ["build_sharded_jk_step", "fock_step_spec"]
