"""Minimal RHF on TPU (reference counterpart: examples/00-pyscf_scf.py).

The standalone driver replaces the reference's apply(mf) monkey-patch
workflow when PySCF is not installed; with PySCF present the same SCF can
be driven through joltqc_tpu.pyscf.apply (see 05-pyscf_patch.py).
"""

from joltqc_tpu.mol import Molecule
from joltqc_tpu.scf import RHF

mol = Molecule.from_atom_string(
    "O 0 0 0.1174; H -0.757 0 -0.4696; H 0.757 0 -0.4696",
    basis="6-31g",
)
mf = RHF(mol, verbose=1)
e = mf.kernel()
print(f"E(RHF/6-31g) = {e:.10f} Ha  (converged: {mf.converged})")
print("timing:", mf.scf_summary)
