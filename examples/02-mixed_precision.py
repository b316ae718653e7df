"""FP32 / DF64 / mixed precision task routing
(reference counterpart: examples/02-mixed_precision.py).

The cutoffs route each screened shell-quartet task by its Schwarz x
density bound: contributions above cutoff_fp64 run in DF64 (compensated
float32 pairs, ~1e-14), the rest in plain f32.  cutoff_fp32 drops tasks
entirely.
"""

from joltqc_tpu.mol import Molecule
from joltqc_tpu.scf import RHF

mol = Molecule.from_atom_string(
    "O 0 0 0.1174; H -0.757 0 -0.4696; H 0.757 0 -0.4696",
    basis="6-31g",
)

configs = {
    "df64-only": dict(cutoff_fp32=1e-13, cutoff_fp64=1e-30),
    "mixed (default)": dict(cutoff_fp32=1e-13, cutoff_fp64=1e-6),
    "fp32-only": dict(cutoff_fp32=1e-13, cutoff_fp64=1e30),
}
ref = None
for name, cfg in configs.items():
    mf = RHF(mol, **cfg)
    e = mf.kernel()
    if ref is None:
        ref = e
    print(f"{name:16s} E = {e:.10f}  dE vs df64 = {e - ref:+.2e}")
