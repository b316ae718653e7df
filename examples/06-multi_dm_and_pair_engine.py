"""Multi-density Fock builds and the pair-algorithm engine.

Two round-2 engine features:

1. Stacked densities: ``JKEngine.get_jk`` accepts (n_dm, nao, nao) and
   evaluates the screened ERIs ONCE, contracting them with every
   density inside the same compiled scan (reference: the ``n_dm``
   kernel template argument, /root/reference/jqc/backend/jk_1qnt.py).
   This is the shape TDDFT / CPHF response solvers call with.

2. The pair-algorithm engine (reference: the experimental pair-based
   path, /root/reference/jqc/pyscf/jk_pair.py): J via the Hermite-
   density factorization, K via per-(bra-pair, ket-pair) E @ M @ E^T
   MXU matmuls -- an alternative compute shape to the contracted
   quartet engine, useful for J-only (pure functional) DFT.
"""

import numpy as np

from joltqc_tpu.mol import Molecule
from joltqc_tpu.mol.layout import BasisLayout
from joltqc_tpu.scf import JKEngine, PairJKEngine

mol = Molecule.from_atom_string(
    "O 0 0 0.1174; H -0.757 0 -0.4696; H 0.757 0 -0.4696", basis="6-31g"
)
layout = BasisLayout(mol)
nao = mol.nao
rng = np.random.default_rng(0)

# --- stacked densities through one ERI pass -------------------------
dms = np.stack(
    [(lambda a: a + a.T)(rng.uniform(-1, 1, (nao, nao))) for _ in range(3)]
)
eng = JKEngine(layout)
vj, vk = eng.get_jk(dms)  # (3, nao, nao) each
print("batched multi-dm:", vj.shape, vk.shape)

# --- pair-algorithm engine ------------------------------------------
pair = PairJKEngine(layout)
vj_p = pair.get_j(dms[0])  # Hermite-density Coulomb
vk_p = pair.get_k(dms[0])  # E @ M @ E^T exchange
print("pair vs quartet |dJ| =", np.abs(vj_p - vj[0]).max())
print("pair vs quartet |dK| =", np.abs(vk_p - vk[0]).max())
