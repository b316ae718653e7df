"""wB97M-V parameter-set search via non-self-consistent Exc screening.

Strategy: the B97-series Exc is LINEAR in the series coefficients, so at
a FIXED density every candidate's total energy is

    E_NSC = E_fixed + sum_c c * M[channel][(i,j)]

with M the per-channel moment integrals  int base(r) * w^i * u^j d3r.
One cheap SCF (b3lyp) fixes dm; moments are precomputed once; then
thousands of candidate (i,j)-assignments cost microseconds each.
E_NSC - E_SCF(cand) = eps >= 0 (variational); eps is calibrated with the
known P1 SCF result.  Winners within a few mHa of anchor+eps get a full
SCF confirmation afterwards.

MEASURED RESULTS (2026-08, H2O/def2-tzvpp, fine (99,590) grid + coarse
VV10 grid, anchor -76.4334218842 = ref test_dft.py:105):
 - eps(P1, dm=b3lyp) = +1.249 mHa -- the NSC gap is small, so the
   method resolves candidate sets to ~1-2 mHa.  P1's NSC prediction
   reproduces its measured SCF miss (-59.9 mHa) exactly.
 - EVERY curated from-memory reconstruction of the JCP 144, 214110
   (2016) Table 3 parameter set misses by 15-130 mHa (see SS_VARIANTS x
   OS_VARIANTS grid below).
 - A blind search over (i,j) assignments produces thousands of
   accidental matches per 0.2 mHa window: ONE anchor equation cannot
   identify 4+ unknown term placements.  The tool can therefore only
   CONFIRM an externally-sourced parameter set, not discover one.
 - No auditable source for the parameters exists in this environment
   (no libxc, no pyscf, no cached wheels with either -- verified by
   filesystem search).  Per the verify-or-delete policy (dft/xc_data.py)
   wb97m-v remains gated until a real source is available; this tool
   then verifies it in seconds.
"""
import itertools
import json
import os
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np  # noqa: E402
from scipy.linalg import eigh  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from joltqc_tpu.mol import Molecule  # noqa: E402
from joltqc_tpu.mol import intor_np  # noqa: E402
from joltqc_tpu.mol.numint_np import eval_rho_np, eval_vxc_np  # noqa: E402
from joltqc_tpu.dft.grids import Grids  # noqa: E402
from joltqc_tpu.dft.vv10 import nlc_exc_vxc  # noqa: E402
from joltqc_tpu.scf.diis import DIIS  # noqa: E402
from joltqc_tpu.dft import xc as xcmod  # noqa: E402

H2O = "O 0 0 0.1174; H -0.757 0 -0.4696; H 0.757 0 -0.4696"
ANCHOR = -76.4334218842
P1_SCF = -76.4933176940  # converged SCF of candidate P1 (prev session)
OMEGA, HYB, ALPHA = 0.3, 0.15, 1.0
NLC_B, NLC_C = 6.0, 0.01
IMAX, JMAX = 9, 9  # moment table is (IMAX+1)x(JMAX+1) per channel

CACHE = os.environ.get("JQC_WB97MV_STATE", "/tmp/wb97mv_screen_state.npz")


def build_state():
    mol = Molecule.from_atom_string(H2O, basis="def2-tzvpp")
    layout = mol.layout if hasattr(mol, "layout") else None
    from joltqc_tpu.mol.layout import BasisLayout

    layout = BasisLayout(mol)
    grids = Grids(mol, n_rad=99, n_ang=590).build()
    nlcg = Grids(mol, n_ang=194).build()
    s = intor_np.overlap(mol)
    h = intor_np.kinetic(mol) + intor_np.nuclear(mol)
    eri = intor_np.eri(mol)
    eri_lr = intor_np.eri(mol, omega=OMEGA)
    e_nuc = mol.energy_nuc()
    nocc = mol.nelectron // 2

    # --- cheap SCF (b3lyp) to fix the density --------------------------
    from joltqc_tpu.dft.xc import eval_xc

    _, c = eigh(h, s)
    dm = 2.0 * c[:, :nocc] @ c[:, :nocc].T
    diis = DIIS()
    e_last = 0.0
    for cycle in range(60):
        dm_int = layout.dm_to_internal(dm)
        rho = eval_rho_np(layout, grids.coords, dm_int, "gga")
        sigma = (rho[1:4] ** 2).sum(0)
        e_xc, vr, vs, vt = eval_xc("b3lyp", rho[0], sigma, None)
        w = grids.weights
        exc = float(np.sum(w * e_xc))
        wv = np.concatenate([(w * vr)[None], 2.0 * (w * vs)[None] * rho[1:4]])
        vxc = layout.mat_to_mol(eval_vxc_np(layout, grids.coords, wv, "gga"))
        vj = np.einsum("ijkl,kl->ij", eri, dm)
        vk = 0.2 * np.einsum("ikjl,kl->ij", eri, dm)
        veff = vxc + vj - 0.5 * vk
        exc -= 0.25 * float(np.einsum("ij,ij->", dm, vk))
        e_tot = (
            float(np.einsum("ij,ij->", dm, h))
            + 0.5 * float(np.einsum("ij,ij->", dm, vj))
            + exc + e_nuc
        )
        f = diis.update(s, dm, h + veff)
        _, c = eigh(f, s)
        dm = 2.0 * c[:, :nocc] @ c[:, :nocc].T
        if abs(e_tot - e_last) < 1e-9 and cycle > 0:
            break
        e_last = e_tot
    print(f"b3lyp SCF done: {e_tot:.10f} (cycle {cycle})", flush=True)

    # --- fixed energy parts at dm --------------------------------------
    dm_int = layout.dm_to_internal(dm)
    rho = eval_rho_np(layout, grids.coords, dm_int, "mgga")
    sigma = (rho[1:4] ** 2).sum(0)
    tau = rho[4]
    vj = np.einsum("ijkl,kl->ij", eri, dm)
    vk = np.einsum("ikjl,kl->ij", eri, dm)
    vk_lr = np.einsum("ikjl,kl->ij", eri_lr, dm)
    vk_eff = HYB * vk + (ALPHA - HYB) * vk_lr
    e_fixed = (
        float(np.einsum("ij,ij->", dm, h))
        + 0.5 * float(np.einsum("ij,ij->", dm, vj))
        - 0.25 * float(np.einsum("ij,ij->", dm, vk_eff))
        + e_nuc
    )
    # VV10 (fixed params) on the coarse grid
    rho_n = eval_rho_np(layout, nlcg.coords, dm_int, "gga")
    sig_n = (rho_n[1:4] ** 2).sum(0)
    e_vv10, _, _ = nlc_exc_vxc(
        nlcg.coords, nlcg.weights, rho_n[0], sig_n, NLC_B, NLC_C,
        block=1024,
    )
    e_fixed += float(e_vv10)
    print(f"E_fixed (e1+J+K_eff+Enuc+VV10) = {e_fixed:.10f}", flush=True)

    # --- moment tables -------------------------------------------------
    w = grids.weights
    good = rho[0] > 1e-13
    r, sg, t = rho[0][good], sigma[good], tau[good]
    wt = w[good]
    rho_s = r / 2.0
    x2 = (sg / 4.0) / rho_s ** (8.0 / 3.0)
    gx, gss, gos = (0.004, 0.2, 0.006)
    u_x = np.asarray(xcmod._b97_u(gx, x2))
    u_ss = np.asarray(xcmod._b97_u(gss, x2))
    u_os = np.asarray(xcmod._b97_u(gos, x2))
    wvar = np.asarray(xcmod._b97_w(rho_s, t / 2.0))
    base_x = np.asarray(xcmod._ex_slater_sr(r, OMEGA))
    e_ss_lda = rho_s * np.asarray(xcmod._pw92_eps_pol(rho_s))
    base_ss = 2.0 * e_ss_lda
    base_os = r * np.asarray(xcmod._pw92_eps(r)) - 2.0 * e_ss_lda

    def moments(base, u):
        M = np.zeros((IMAX + 1, JMAX + 1))
        wp = np.ones_like(u)
        for i in range(IMAX + 1):
            up = np.ones_like(u)
            for j in range(JMAX + 1):
                M[i, j] = np.sum(wt * base * wp * up)
                up = up * u
            wp = wp * wvar
        return M

    Mx = moments(base_x, u_x)
    Mss = moments(base_ss, u_ss)
    Mos = moments(base_os, u_os)
    np.savez(CACHE, dm=dm, e_fixed=e_fixed, Mx=Mx, Mss=Mss, Mos=Mos)
    print("state cached", flush=True)
    return e_fixed, Mx, Mss, Mos


def e_nsc(Mx, Mss, Mos, e_fixed, x, css, cos):
    e = e_fixed
    for (i, j), c in x.items():
        e += c * Mx[i, j]
    for (i, j), c in css.items():
        e += c * Mss[i, j]
    for (i, j), c in cos.items():
        e += c * Mos[i, j]
    return e


def main():
    t0 = time.time()
    if os.path.exists(CACHE):
        z = np.load(CACHE)
        e_fixed, Mx, Mss, Mos = (
            float(z["e_fixed"]), z["Mx"], z["Mss"], z["Mos"],
        )
        print("state loaded from cache", flush=True)
    else:
        e_fixed, Mx, Mss, Mos = build_state()
    print(f"setup {time.time()-t0:.0f}s", flush=True)

    X = {(0, 0): 0.85, (0, 1): 1.007, (1, 0): 0.259}

    # calibrate eps with P1 (SCF known)
    P1_css = {(0, 0): 0.443, (0, 4): -1.437, (1, 0): -4.535,
              (3, 4): 4.278, (4, 3): -0.640}
    P1_cos = {(0, 0): 1.0, (1, 0): 1.358, (2, 0): 2.924, (6, 0): -8.812}
    eps = e_nsc(Mx, Mss, Mos, e_fixed, X, P1_css, P1_cos) - P1_SCF
    print(f"eps(P1, dm=b3lyp) = {eps*1e3:+.3f} mHa", flush=True)

    # ---------------- curated candidates (libxc-recall variants) -------
    SS_VARIANTS = {
        "ssA": {(0, 0): 0.443, (0, 4): -1.437, (1, 0): -4.535,
                (2, 0): -3.390, (4, 3): 4.278},
        "ssB": {(0, 0): 0.443, (0, 4): -1.437, (1, 0): -4.535,
                (2, 0): -3.390, (3, 4): 4.278},
        "ssC": {(0, 0): 0.443, (0, 4): -1.437, (1, 0): -4.535,
                (2, 0): -3.390, (4, 3): 4.278, (6, 0): -0.640},
        "ssP1": {(0, 0): 0.443, (0, 4): -1.437, (1, 0): -4.535,
                 (3, 4): 4.278, (4, 3): -0.640},
    }
    OS_VARIANTS = {
        "osA": {(0, 0): 1.0, (1, 0): 1.358, (2, 0): 2.924,
                (6, 0): -8.812, (6, 1): -1.390},
        "osB": {(0, 0): 1.0, (1, 0): 1.358, (2, 0): 2.924,
                (6, 0): -8.812, (2, 6): -1.390},
        "osC": {(0, 0): 1.0, (1, 0): 1.358, (2, 0): 2.924,
                (6, 0): -1.390, (2, 6): -8.812},
        "osD": {(0, 0): 1.0, (1, 0): 1.358, (2, 0): 2.924,
                (6, 0): -8.812},
        "osE": {(0, 0): 1.0, (0, 1): 1.358, (0, 2): 2.924,
                (6, 0): -8.812, (6, 1): -1.390},
    }
    print("--- curated grid (d = E_NSC - eps - anchor) ---", flush=True)
    for sname, css in SS_VARIANTS.items():
        for oname, cos in OS_VARIANTS.items():
            e = e_nsc(Mx, Mss, Mos, e_fixed, X, css, cos)
            d = e - eps - ANCHOR
            print(f"{sname}+{oname}: d={d*1e3:+8.3f} mHa", flush=True)

    # ---------------- constrained vectorized search --------------------
    # fix ss to each variant; search os 4-term assignments over a pair
    # menu (sorted-array matching).
    os_vals = [1.358, 2.924, -8.812, -1.390]
    pair_menu = [(0, 1), (0, 2), (0, 3), (0, 4), (0, 6), (1, 0), (2, 0),
                 (3, 0), (4, 0), (6, 0), (1, 1), (2, 2), (3, 4), (4, 3),
                 (2, 1), (1, 2), (6, 1), (1, 6), (2, 6), (6, 2)]
    Mos_menu = np.array([Mos[i, j] for i, j in pair_menu])
    assigns = list(itertools.permutations(range(len(pair_menu)), 4))
    A = np.array(assigns)
    os_sums = sum(os_vals[k] * Mos_menu[A[:, k]] for k in range(4))
    found = []
    for sname, css in SS_VARIANTS.items():
        base = e_nsc(Mx, Mss, Mos, e_fixed, X, css, {(0, 0): 1.0})
        d = base + os_sums - eps - ANCHOR
        hit = np.where(np.abs(d) < 5e-4)[0]
        for k in hit:
            found.append((abs(d[k]), d[k], sname,
                          tuple(pair_menu[i] for i in assigns[k])))
    found.sort()
    print(f"search: {len(found)} hits within 0.5 mHa", flush=True)
    for ad, d, sname, osa in found[:30]:
        print(f"d={d*1e3:+7.3f} mHa  {sname}  os={osa}", flush=True)
    with open("/tmp/wb97mv_screen_results.json", "w") as f:
        json.dump([{"d_mha": d * 1e3, "ss": sname,
                    "os": list(map(list, osa))}
                   for _, d, sname, osa in found[:200]], f)


if __name__ == "__main__":
    main()
