"""ECP integrals, SCF, and nuclear gradients
(reference counterpart: examples/05-patch_gpu4pyscf_ecp.py).

The ECP block is NWChem format; any ECP file can be passed as a string.
"""

import numpy as np

from joltqc_tpu.mol import Molecule
from joltqc_tpu.mol.layout import BasisLayout
from joltqc_tpu.scf import RHF
from joltqc_tpu.scf.ecp import ECPEngine

ECP = """
ECP
O nelec 2
O ul
2 1.24 -2.30
1 4.50 1.10
0 3.00 2.00
O S
2 5.35 10.2
2 1.04 2.29
O P
2 2.45 5.10
END
"""

mol = Molecule.from_atom_string(
    "O 0 0 0; H 0 0 1.9", basis="sto-3g", charge=1, ecp=ECP
)
print("electrons (with 2-core ECP):", mol.nelectron)

mf = RHF(mol)
e = mf.kernel()
print(f"E(RHF, ECP) = {e:.10f} Ha")

eng = ECPEngine(BasisLayout(mol))
grad = eng.gradient(mf.dm)
print("ECP nuclear gradient (Ha/Bohr):")
print(np.array_str(grad, precision=8))
