"""Anchor-verify the M06 parameter data against the reference SCF anchor.

Protocol (matching /root/reference/jqc/pyscf/tests/test_dft.py:91-94):
H2O / def2-tzvpp, fine (99, 590) grid, restricted SCF, M06 (27% HF).
The reference obtains -76.4265870634 through GPU4PySCF + libxc; this
script runs the same SCF with the repo's own f64 oracle pipeline (dense
numpy ERIs + numpy numint + autodiff XC) -- the b3lyp control on this
exact pipeline matched its anchor to 4.5e-8 Ha (wb97mv_screen.py), so a
match here verifies the M06 data in dft/xc_data.py.

Usage: python benchmarks/m06_verify.py [xc] [anchor]
"""
import os
import sys
import time

# the m06 alias is anchor-gated (xc_data.py provenance notes); this
# script IS the verification tool, so it lifts the gate for itself
os.environ.setdefault("JQC_ALLOW_UNVERIFIED_XC", "1")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np  # noqa: E402
from scipy.linalg import eigh  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from joltqc_tpu.mol import Molecule  # noqa: E402
from joltqc_tpu.mol import intor_np  # noqa: E402
from joltqc_tpu.mol.layout import BasisLayout  # noqa: E402
from joltqc_tpu.mol.numint_np import eval_rho_np, eval_vxc_np  # noqa: E402
from joltqc_tpu.dft.grids import Grids  # noqa: E402
from joltqc_tpu.dft.xc import eval_xc, hybrid_coeff, needs_tau  # noqa: E402
from joltqc_tpu.scf.diis import DIIS  # noqa: E402

H2O = "O 0 0 0.1174; H -0.757 0 -0.4696; H 0.757 0 -0.4696"
ANCHORS = {"m06": -76.4265870634, "b3lyp": -76.4666495594}


def run_scf(xc, mol=None, conv=1e-9, verbose=True):
    mol = mol or Molecule.from_atom_string(H2O, basis="def2-tzvpp")
    layout = BasisLayout(mol)
    grids = Grids(mol, n_rad=99, n_ang=590).build()
    s = intor_np.overlap(mol)
    h = intor_np.kinetic(mol) + intor_np.nuclear(mol)
    eri = intor_np.eri(mol)
    e_nuc = mol.energy_nuc()
    nocc = mol.nelectron // 2
    hyb = hybrid_coeff(xc)
    fam = "mgga" if needs_tau(xc) else "gga"

    _, c = eigh(h, s)
    dm = 2.0 * c[:, :nocc] @ c[:, :nocc].T
    diis = DIIS()
    e_last = 0.0
    for cycle in range(80):
        dm_int = layout.dm_to_internal(dm)
        rho = eval_rho_np(layout, grids.coords, dm_int, fam)
        sigma = (rho[1:4] ** 2).sum(0)
        tau = rho[4] if fam == "mgga" else None
        e_xc, vr, vs, vt = eval_xc(xc, rho[0], sigma, tau)
        w = grids.weights
        exc = float(np.sum(w * e_xc))
        rows = [(w * vr)[None], 2.0 * (w * vs)[None] * rho[1:4]]
        if fam == "mgga":
            rows.append((w * vt)[None])
        wv = np.concatenate(rows)
        vxc = layout.mat_to_mol(eval_vxc_np(layout, grids.coords, wv, fam))
        vj = np.einsum("ijkl,kl->ij", eri, dm)
        veff = vxc + vj
        if hyb:
            vk = hyb * np.einsum("ikjl,kl->ij", eri, dm)
            veff = veff - 0.5 * vk
            exc -= 0.25 * float(np.einsum("ij,ij->", dm, vk))
        e_tot = (
            float(np.einsum("ij,ij->", dm, h))
            + 0.5 * float(np.einsum("ij,ij->", dm, vj))
            + exc + e_nuc
        )
        f = diis.update(s, dm, h + veff)
        _, c = eigh(f, s)
        dm = 2.0 * c[:, :nocc] @ c[:, :nocc].T
        if verbose:
            print(f"  cycle {cycle:2d}  E = {e_tot:.10f}", flush=True)
        if abs(e_tot - e_last) < conv and cycle > 0:
            break
        e_last = e_tot
    return e_tot, cycle


def main():
    xc = sys.argv[1] if len(sys.argv) > 1 else "m06"
    anchor = float(sys.argv[2]) if len(sys.argv) > 2 else ANCHORS.get(xc)
    t0 = time.time()
    e, cyc = run_scf(xc)
    print(f"{xc} SCF: {e:.10f}  ({cyc} cycles, {time.time()-t0:.0f}s)")
    if anchor is not None:
        print(f"anchor: {anchor:.10f}  delta = {(e-anchor)*1e3:+.4f} mHa")
        ok = abs(e - anchor) < 1e-5
        print("VERIFIED" if ok else "MISMATCH")
        sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
