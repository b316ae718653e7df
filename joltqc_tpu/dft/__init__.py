"""DFT: molecular quadrature grids, XC functionals, numerical integration.

Reference counterpart: /root/reference/jqc/backend/dft/ + jqc/pyscf/rks.py
(CUDA eval_rho / eval_vxc / vv10 kernels + PySCF grid machinery + libxc).
TPU-native redesign: grids are built host-side in numpy (one-time, O(N)),
AO/rho/vxc evaluation are MXU matmuls over grid blocks, and XC functionals
are implemented directly in JAX with ``jax.grad`` supplying the potentials
-- no libxc dependency (none exists in this environment).
"""

from .grids import Grids
from .xc import eval_xc, hybrid_coeff, is_gga, parse_xc

__all__ = ["Grids", "eval_xc", "parse_xc", "hybrid_coeff", "is_gga"]
