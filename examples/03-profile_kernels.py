"""Inspect per-class kernel timings (reference counterpart:
examples/03-analyze_cuda_kernel.py -- there, dumping generated CUDA; here,
per-(angular, nprim, tier) wall times of the compiled XLA class scans).
"""

from joltqc_tpu.mol import Molecule
from joltqc_tpu.scf import RHF

mol = Molecule.from_atom_string(
    "O 0 0 0.1174; H -0.757 0 -0.4696; H 0.757 0 -0.4696",
    basis="6-31g",
)
mf = RHF(mol)
s, h = mf.get_ovlp(), mf.get_hcore()
dm = mf.init_guess(s, h)

mf.jk.get_jk(dm)  # warmup: compiles every class kernel
mf.jk.profile = True
mf.jk.get_jk(dm)

print(f"{'ms':>9}  (angular quartet, nprim buckets, tier)")
for key, t in sorted(mf.jk.class_time.items(), key=lambda kv: -kv[1]):
    print(f"{t*1e3:9.2f}  {key}")
