"""RKS DFT: pure, hybrid, and range-separated meta-GGA functionals
(reference counterpart: examples/01-pyscf_dft.py).
"""

from joltqc_tpu.mol import Molecule
from joltqc_tpu.scf import RKS

mol = Molecule.from_atom_string(
    "O 0 0 0.1174; H -0.757 0 -0.4696; H 0.757 0 -0.4696",
    basis="6-31g",
)

for xc in ("pbe", "b3lyp", "wb97x-v"):
    mf = RKS(mol, xc=xc)
    e = mf.kernel()
    print(f"E({xc}) = {e:.10f} Ha  (grid nelec = {mf._nelec_grid:.6f})")
