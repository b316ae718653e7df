"""M06 parameter-set screening via non-self-consistent Exc moments.

Same method as wb97mv_screen.py: every M06-family energy term is LINEAR
in the series coefficients (a_i, dx_k, css_i, dss_k, cos_i, dos_k) at a
FIXED density, so one cheap b3lyp SCF + precomputed per-channel moment
integrals turn a candidate evaluation into a dot product.  eps =
E_NSC - E_SCF is calibrated by running one full SCF of a reference
candidate.

Structural validators (exact in the defining papers, used as unit
tests in tests/test_xc_m06.py): per correlation channel c0 + d0 = 1
(UEG limit is the bare PW92 partition), and for exchange
a0 + dx0 = 1 - hyb (UEG exchange sums to the non-HF fraction).

Usage:
  python benchmarks/m06_screen.py build     # b3lyp SCF + moments -> npz
  python benchmarks/m06_screen.py screen    # evaluate candidates
"""
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from joltqc_tpu.dft import xc as xcmod  # noqa: E402
from joltqc_tpu.dft.grids import Grids  # noqa: E402
from joltqc_tpu.mol import Molecule, intor_np  # noqa: E402
from joltqc_tpu.mol.layout import BasisLayout  # noqa: E402
from joltqc_tpu.mol.numint_np import eval_rho_np  # noqa: E402

H2O = "O 0 0 0.1174; H -0.757 0 -0.4696; H 0.757 0 -0.4696"
ANCHOR = -76.4265870634  # ref test_dft.py:91-94 (M06, H2O/def2-tzvpp)
HYB = 0.27
CACHE = os.environ.get("JQC_M06_STATE", "/tmp/m06_screen_state.npz")


def build_state():
    from benchmarks.m06_verify import run_scf  # reuse the oracle SCF

    mol = Molecule.from_atom_string(H2O, basis="def2-tzvpp")
    layout = BasisLayout(mol)
    grids = Grids(mol, n_rad=99, n_ang=590).build()
    s = intor_np.overlap(mol)
    h = intor_np.kinetic(mol) + intor_np.nuclear(mol)
    eri = intor_np.eri(mol)
    e_nuc = mol.energy_nuc()

    # frozen density from a cheap b3lyp SCF (same pipeline)
    import scipy.linalg as sla

    from joltqc_tpu.dft.xc import eval_xc
    from joltqc_tpu.scf.diis import DIIS

    nocc = mol.nelectron // 2
    _, c = sla.eigh(h, s)
    dm = 2.0 * c[:, :nocc] @ c[:, :nocc].T
    diis = DIIS()
    e_last = 0.0
    from joltqc_tpu.mol.numint_np import eval_vxc_np

    for cycle in range(60):
        dm_int = layout.dm_to_internal(dm)
        rho = eval_rho_np(layout, grids.coords, dm_int, "gga")
        sigma = (rho[1:4] ** 2).sum(0)
        e_xc, vr, vs, _ = eval_xc("b3lyp", rho[0], sigma, None)
        w = grids.weights
        exc = float(np.sum(w * e_xc))
        wv = np.concatenate([(w * vr)[None], 2.0 * (w * vs)[None] * rho[1:4]])
        vxc = layout.mat_to_mol(eval_vxc_np(layout, grids.coords, wv, "gga"))
        vj = np.einsum("ijkl,kl->ij", eri, dm)
        vk = 0.2 * np.einsum("ikjl,kl->ij", eri, dm)
        f = h + vxc + vj - 0.5 * vk
        exc -= 0.25 * float(np.einsum("ij,ij->", dm, vk))
        e_tot = (
            float(np.einsum("ij,ij->", dm, h))
            + 0.5 * float(np.einsum("ij,ij->", dm, vj))
            + exc + e_nuc
        )
        f = diis.update(s, dm, f)
        _, c = sla.eigh(f, s)
        dm = 2.0 * c[:, :nocc] @ c[:, :nocc].T
        if abs(e_tot - e_last) < 1e-9 and cycle > 0:
            break
        e_last = e_tot
    print(f"b3lyp SCF: {e_tot:.10f} (cycle {cycle})", flush=True)

    dm_int = layout.dm_to_internal(dm)
    rho = eval_rho_np(layout, grids.coords, dm_int, "mgga")
    sigma = (rho[1:4] ** 2).sum(0)
    tau = rho[4]
    vj = np.einsum("ijkl,kl->ij", eri, dm)
    vk = np.einsum("ikjl,kl->ij", eri, dm)
    e_fixed = (
        float(np.einsum("ij,ij->", dm, h))
        + 0.5 * float(np.einsum("ij,ij->", dm, vj))
        - 0.25 * HYB * float(np.einsum("ij,ij->", dm, vk))
        + e_nuc
    )

    w = grids.weights
    good = rho[0] > 1e-13
    r, sg, t = rho[0][good], sigma[good], tau[good]
    wt = w[good]
    rho_s = r / 2.0
    tau_s = t / 2.0
    x2 = (sg / 4.0) / rho_s ** (8.0 / 3.0)
    z = 2.0 * tau_s / rho_s ** (5.0 / 3.0) - xcmod._CF_VSXC
    D = np.clip(1.0 - x2 / (4.0 * (z + xcmod._CF_VSXC)), 0.0, 1.0)
    wvar = np.asarray(xcmod._b97_w(rho_s, tau_s))
    e_pbe = np.asarray(xcmod._ex_pbe(r, sg, t))
    e_lsda = np.asarray(xcmod._ex_slater(r, sg, t))
    e_ss_lda = rho_s * np.asarray(xcmod._pw92_eps_pol(rho_s))
    e_os_lda = r * np.asarray(xcmod._pw92_eps(r)) - 2.0 * e_ss_lda
    ax, ass_, aos_ = __import__(
        "joltqc_tpu.dft.xc_data", fromlist=["M06_ALPHA"]
    ).M06_ALPHA
    gam_ss, gam_os = __import__(
        "joltqc_tpu.dft.xc_data", fromlist=["M06_GAMMA"]
    ).M06_GAMMA

    def hbasis(x2v, zv, alpha):
        g = 1.0 + alpha * (x2v + zv)
        return np.stack([
            1.0 / g, x2v / g**2, zv / g**2,
            x2v * x2v / g**3, x2v * zv / g**3, zv * zv / g**3,
        ])

    # exchange: a_i moments + dx_k moments
    Mx_a = np.array([np.sum(wt * e_pbe * wvar**i) for i in range(12)])
    Mx_d = np.array([np.sum(wt * e_lsda * hb)
                     for hb in hbasis(x2, z, ax)])
    u_ss = gam_ss * x2 / (1.0 + gam_ss * x2)
    Mc_ss = np.array([np.sum(wt * 2.0 * e_ss_lda * D * u_ss**i)
                      for i in range(5)])
    Md_ss = np.array([np.sum(wt * 2.0 * e_ss_lda * D * hb)
                      for hb in hbasis(x2, z, ass_)])
    x2o, zo = 2.0 * x2, 2.0 * z
    u_os = gam_os * x2o / (1.0 + gam_os * x2o)
    Mc_os = np.array([np.sum(wt * e_os_lda * u_os**i) for i in range(5)])
    Md_os = np.array([np.sum(wt * e_os_lda * hb)
                      for hb in hbasis(x2o, zo, aos_)])
    np.savez(CACHE, e_fixed=e_fixed, Mx_a=Mx_a, Mx_d=Mx_d, Mc_ss=Mc_ss,
             Md_ss=Md_ss, Mc_os=Mc_os, Md_os=Md_os,
             wt=wt, r=r, sg=sg, t=t)  # raw rows: recompute moment
             # variants (tau/D-convention experiments) without the SCF
    print(f"E_fixed = {e_fixed:.10f}; moments cached -> {CACHE}", flush=True)


def e_nsc(p, z):
    return float(
        z["e_fixed"]
        + np.dot(p["a"], z["Mx_a"]) + np.dot(p["dx"], z["Mx_d"])
        + np.dot(p["css"], z["Mc_ss"]) + np.dot(p["dss"], z["Md_ss"])
        + np.dot(p["cos"], z["Mc_os"]) + np.dot(p["dos"], z["Md_os"])
    )


def screen():
    from joltqc_tpu.dft.xc_data import M06_FUNCTIONALS

    z = np.load(CACHE)
    base = M06_FUNCTIONALS["m06"]
    print(f"anchor {ANCHOR:.6f}; NSC sits ~1-2 mHa ABOVE the SCF value")
    e = e_nsc(base, z)
    print(f"current m06 data: E_NSC = {e:.6f}  (vs anchor "
          f"{(e - ANCHOR) * 1e3:+.2f} mHa)")
    # per-channel contributions for debugging
    for ch, cv, mv in (
        ("x_a", base["a"], z["Mx_a"]), ("x_d", base["dx"], z["Mx_d"]),
        ("c_ss", base["css"], z["Mc_ss"]), ("d_ss", base["dss"], z["Md_ss"]),
        ("c_os", base["cos"], z["Mc_os"]), ("d_os", base["dos"], z["Md_os"]),
    ):
        print(f"  {ch:5s} contribution = {np.dot(cv, mv):+.6f}")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "screen"
    if mode == "build":
        build_state()
    screen()
