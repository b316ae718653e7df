"""joltqc_tpu: TPU-native JIT kernel framework for quantum chemistry.

A from-scratch re-creation of the capabilities of the reference CUDA
backend (ByteDance-Seed/JoltQC) designed TPU-first:

- Pallas/XLA shell-class-specialized ERI kernels via McMurchie-Davidson
  recurrences (replacing NVRTC-compiled Rys-quadrature CUDA kernels)
- compensated double-float ("DF64") arithmetic for the FP64 precision
  tier (TPUs have no native float64)
- FP32 / DF64 / mixed-precision task routing via host-side Schwarz +
  density screening partition (replacing the on-device atomic task queue)
- DFT numerical integration mapped onto MXU matmuls
- a standalone molecule/basis/SCF layer (so the framework runs without
  PySCF) plus a PySCF-compatible ``joltqc_tpu.pyscf.apply`` patch layer
  activated when PySCF is importable.
"""

__version__ = "0.1.0"

from .utils.cache import enable_persistent_cache as _enable_cache

_enable_cache()
del _enable_cache
