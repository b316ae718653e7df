"""AOT deployment via the persistent XLA compilation cache
(reference counterpart: examples/04-AOT_deployment.py, which redirects
CUPY_CACHE_DIR to ship precompiled cubins).

joltqc_tpu enables the JAX persistent compilation cache on import
(~/.cache/joltqc_tpu/xla, override with JQC_CACHE_DIR).  First run of a
workload compiles each (class, tier) kernel; later runs -- including in
fresh processes or shipped containers -- reload the compiled executables
from disk.  Run this script twice and compare the reported warmup times.
"""

import os
import time

from joltqc_tpu.mol import Molecule
from joltqc_tpu.scf import RHF

print("cache dir:", os.environ.get("JQC_CACHE_DIR",
                                   os.path.expanduser("~/.cache/joltqc_tpu/xla")))

mol = Molecule.from_atom_string(
    "O 0 0 0.1174; H -0.757 0 -0.4696; H 0.757 0 -0.4696",
    basis="sto-3g",
)
mf = RHF(mol)
s, h = mf.get_ovlp(), mf.get_hcore()
dm = mf.init_guess(s, h)

t0 = time.time()
mf.jk.get_jk(dm)
print(f"first get_jk (compile or cache load): {time.time()-t0:.1f} s")
t0 = time.time()
mf.jk.get_jk(dm)
print(f"second get_jk (hot):                  {time.time()-t0:.3f} s")
