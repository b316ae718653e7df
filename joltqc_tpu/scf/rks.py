"""Restricted Kohn-Sham DFT driver.

Reference counterpart: /root/reference/jqc/pyscf/rks.py (generate_rks_kernel,
generate_get_veff -- closures patched onto GPU4PySCF RKS objects).  Here
the driver is standalone: it reuses the RHF SCF loop (scf/hf.py) and
overrides ``get_veff``/``energy_elec`` with grid XC + J (+ hybrid /
range-separated K), mirroring the decomposition of the reference's
get_veff (jqc/pyscf/rks.py:180-262) including the RSH composition
K_eff = hyb*K + (alpha-hyb)*K_lr(omega).

Supports LDA / GGA / meta-GGA (tau) functionals, global hybrids,
range-separated hybrids, and VV10 nonlocal correlation (defaults pulled
from the functional's own nlc metadata, e.g. wb97x-v).

Incremental-DFT caching (reference jqc/pyscf/rks.py:290,329-359): with
``incremental=True`` rho / wv / vxcmat are cached and re-evaluated only
on delta-dm / delta-wv over AABB-selected grid blocks.  Incremental
evaluation, mixed fp32/DF64 precision (dft/mixed.py), and AO-value
screening (dft/screening.py) all COMPOSE: the mixed tier takes the
screened evaluator as its f32 bulk, and both screened evaluators accept
the incremental block selection -- matching the reference, where the
nz sparsity lists, the per-pair precision windows, and the incremental
caches are simultaneously active (jqc/pyscf/rks.py:329-359 +
backend/dft/eval_rho.cu:93-106).
"""

from __future__ import annotations

import numpy as np

from ..dft.grids import Grids
from ..dft.numint import NumInt, eval_rho_all, eval_vxc_mat
from ..dft.xc import eval_xc, nlc_coeff, rsh_coeff, xc_family
from .hf import RHF


class RKS(RHF):
    def __init__(
        self,
        mol,
        xc: str = "lda,vwn",
        grids: Grids | None = None,
        nlc=None,
        nlcgrids: Grids | bool | None = None,
        **kw,
    ):
        super().__init__(mol, **kw)
        self.xc = xc
        self.family = xc_family(xc)
        self.omega, self.alpha, self.hyb = rsh_coeff(xc)
        # nlc: None (functional default) | False (off) | True (VV10
        # b=5.9, C=0.0093) | (b, C)
        if nlc is None:
            self.nlc = nlc_coeff(xc)
        elif nlc is True:
            self.nlc = (5.9, 0.0093)
        elif nlc is False:
            self.nlc = None
        else:
            self.nlc = nlc
        self.grids = grids if grids is not None else Grids(mol)
        # Separate (coarser) grid for the VV10 nonlocal term, matching
        # the reference protocol (mf.nlcgrids.level = 2 while
        # mf.grids.level = 5, /root/reference/jqc/pyscf/tests/
        # test_dft.py:31,56): VV10 is smooth, and its O(N_grid^2) kernel
        # sum makes the fine XC grid needlessly expensive.  None = share
        # self.grids (exact historical behavior); True = build a
        # level-2-like coarse grid.
        if nlcgrids is True:
            nlcgrids = Grids(mol, n_ang=194)
        self.nlcgrids = nlcgrids or None
        self.ni = NumInt(self.layout)
        # DFT precision window (reference config["dft"], jqc/pyscf/
        # __init__.py:100-118): AO pairs whose log bound exceeds
        # cutoff_fp64 are evaluated in DF64 (dft/mixed.py); the rest run
        # the f32 MXU bulk path.  None disables the DF64 tier.
        self.dft_cutoff_fp64 = 1e-6
        self.dft_cutoff_fp32 = 1e-13
        # incremental DFT (reference jqc/pyscf/rks.py:290,329-359): with
        # self.incremental, rho/vxcmat are cached and re-evaluated only
        # on delta-dm / delta-wv over grid blocks whose AABB AO bound x
        # delta magnitude is significant; exact by linearity.
        self.incr_dft_thresh = 1e-13
        self.dft_block_evals = 0  # evaluated-block counter (tests/logs)
        self._dft_cache = None
        self._blk_bounds = None
        # AO-value screening (reference: estimate_log_aovalue sparsity
        # lists): a float threshold (default 1e-12; None selects the same
        # default) enables the sparse path when it drops >40% of the AO
        # work; False = always dense
        self.screen_thresh = 1e-12
        self._scr = None
        self._ecoul = 0.0
        self._exc = 0.0
        self.scf_summary = {}

    def _block_bounds(self):
        """(nblk,) log bound on max |ao_i ao_j| per grid block (AABB)."""
        if getattr(self, "_blk_bounds", None) is not None:
            return self._blk_bounds
        from ..dft.mixed import shell_value_bound
        from ..dft.numint import _blocked

        blocks, _ = _blocked(self.grids.coords, self.ni.block)
        lo = blocks.min(axis=1)
        hi = blocks.max(axis=1)
        diam = np.linalg.norm(hi - lo, axis=1)
        best = np.full(len(blocks), -np.inf)
        for sh in self.mol.shells:
            c = sh.coord[None, :]
            d = np.maximum(lo - c, 0.0) + np.maximum(c - hi, 0.0)
            dist = np.linalg.norm(d, axis=1)
            rmax = dist + diam
            emin = float(sh.exps.min())
            cmax = float(np.abs(sh.coeffs).max() * max(sh.nprim, 1))
            b = (
                np.log(max(cmax, 1e-300))
                + sh.l * np.log(np.maximum(rmax, 1.0))
                - emin * dist**2
            )
            best = np.maximum(best, b)
        self._blk_bounds = 2.0 * best  # |ao_i ao_j| <= exp(2 max log ao)
        return self._blk_bounds

    def _screening(self):
        """Build (once) and return the grid screening, or None for dense."""
        if self._scr is None:
            if self.screen_thresh is False:
                self._scr = False
            else:
                from ..dft.screening import GridScreening

                thresh = (
                    self.screen_thresh
                    if isinstance(self.screen_thresh, float)
                    else 1e-12
                )
                scr = GridScreening(self.ni, self.grids, thresh)
                self._scr = scr if scr.fill_fraction < 0.6 else False
        return self._scr or None

    def get_veff(self, dm):
        if self.grids.coords is None:
            self.grids.build()
        lay = self.layout
        dm = np.asarray(dm, np.float64)
        dm_int = lay.dm_to_internal(dm)

        fam = self.family
        need_grad = fam != "lda" or self.nlc is not None
        rho_fam = fam if fam != "lda" or self.nlc is None else "gga"
        scr = self._screening()
        mixed = self.dft_cutoff_fp64 is not None

        # f32 bulk evaluator: screened sparse path when screening pays,
        # dense MXU path otherwise.  Mixed precision (DF64 heavy pairs)
        # and incremental delta evaluation COMPOSE with either bulk
        # (reference: nz lists + precision windows + incremental caching
        # all active together, /root/reference/jqc/pyscf/rks.py:329-359).
        def bulk_rho(d, sel=None):
            if scr is not None:
                from ..dft.screening import eval_rho_screened

                return eval_rho_screened(
                    self.ni, scr, d, rho_fam, block_sel=sel
                )
            return eval_rho_all(self.ni, self.grids, d, rho_fam, block_sel=sel)

        def rho_eval(d, sel=None):
            if mixed:
                from ..dft.mixed import eval_rho_mixed

                return eval_rho_mixed(
                    self.ni, self.grids, d, rho_fam, lay,
                    self.dft_cutoff_fp64, block_sel=sel, bulk=bulk_rho,
                )
            return bulk_rho(d, sel)

        cache = self._dft_cache if self.incremental else None
        if cache is not None and cache.get("fam") != rho_fam:
            cache = None
        if cache is not None:
            ddm = dm_int - cache["dm_int"]
            bb = self._block_bounds()
            dlog = np.log(max(np.abs(ddm).max(), 1e-300)) + np.log(
                max(self.layout.nao_int, 1)
            )
            sel = np.nonzero(bb + dlog > np.log(self.incr_dft_thresh))[0]
            self.dft_block_evals += len(sel)
            rho = cache["rho"] + (rho_eval(ddm, sel) if len(sel) else 0.0)
        else:
            rho = rho_eval(dm_int)
            if self.incremental:
                self.dft_block_evals += len(self._block_bounds())
        sigma = (rho[1:4] ** 2).sum(axis=0) if need_grad else None
        tau = rho[4] if fam == "mgga" else None
        e, vr, vs, vt = eval_xc(
            self.xc, rho[0], sigma if fam != "lda" else None, tau
        )
        if fam == "lda":
            vs = np.zeros_like(vr)

        w = self.grids.weights
        exc = float(np.sum(w * e))
        self._nelec_grid = float(np.sum(w * rho[0]))

        vxc_nlc_int = None
        if self.nlc is not None:
            from ..dft.vv10 import nlc_exc_vxc

            b, C = self.nlc
            if self.nlcgrids is not None:
                # VV10 on its own (coarse) grid: evaluate GGA rho rows
                # there, add its energy + a separate vxc matrix
                # integrated on that grid.  Dense evaluation -- the nlc
                # grid is small and VV10 potentials are smooth, so the
                # screened/mixed machinery of the main grid is skipped.
                if self.nlcgrids.coords is None:
                    self.nlcgrids.build()
                rho_n = eval_rho_all(self.ni, self.nlcgrids, dm_int, "gga")
                sigma_n = (rho_n[1:4] ** 2).sum(axis=0)
                w_n = self.nlcgrids.weights
                e_nlc, vr_n, vs_n = nlc_exc_vxc(
                    self.nlcgrids.coords, w_n, rho_n[0], sigma_n, b, C
                )
                exc += e_nlc
                wv_n = np.concatenate(
                    [
                        (w_n * vr_n)[None, :],
                        2.0 * (w_n * vs_n)[None, :] * rho_n[1:4],
                    ]
                )
                vxc_nlc_int = eval_vxc_mat(
                    self.ni, self.nlcgrids, wv_n, "gga"
                )
            else:
                # shared grid: fold VV10 potentials into the XC rows
                e_nlc, vr_n, vs_n = nlc_exc_vxc(
                    self.grids.coords, w, rho[0], sigma, b, C
                )
                exc += e_nlc
                vr = vr + vr_n
                vs = vs + vs_n

        if need_grad:
            wv_rows = [(w * vr)[None, :], 2.0 * (w * vs)[None, :] * rho[1:4]]
            if fam == "mgga":
                wv_rows.append((w * vt)[None, :])
            wv = np.concatenate(wv_rows)
            vxc_fam = "mgga" if fam == "mgga" else "gga"
        else:
            wv = (w * vr)[None, :]
            vxc_fam = "lda"
        def bulk_vxc(w, sel=None):
            if scr is not None:
                from ..dft.screening import eval_vxc_screened

                return eval_vxc_screened(
                    self.ni, scr, w, vxc_fam, block_sel=sel
                )
            return eval_vxc_mat(self.ni, self.grids, w, vxc_fam, block_sel=sel)

        def vxc_eval(w, sel=None):
            if mixed:
                from ..dft.mixed import eval_vxc_mixed

                return eval_vxc_mixed(
                    self.ni, self.grids, w, vxc_fam, lay,
                    self.dft_cutoff_fp64, block_sel=sel, bulk=bulk_vxc,
                )
            return bulk_vxc(w, sel)

        if cache is not None and cache.get("vxc_fam") == vxc_fam:
            dwv = wv - cache["wv"]
            bb = self._block_bounds()
            B = self.ni.block
            nblk = len(bb)
            dpad = np.zeros((dwv.shape[0], nblk * B))
            dpad[:, : dwv.shape[1]] = np.abs(dwv)
            blk_max = dpad.reshape(dwv.shape[0], nblk, B).max(axis=(0, 2))
            wlog = np.log(np.maximum(blk_max * B, 1e-300))
            selv = np.nonzero(bb + wlog > np.log(self.incr_dft_thresh))[0]
            self.dft_block_evals += len(selv)
            vxc_int = cache["vxc"] + (
                vxc_eval(dwv, selv) if len(selv) else 0.0
            )
        else:
            vxc_int = vxc_eval(wv)
        if self.incremental:
            # cache holds the MAIN-grid vxc only; the separate-grid VV10
            # term is recomputed in full each iteration (coarse = cheap)
            self._dft_cache = dict(
                dm_int=dm_int, rho=rho, wv=wv, vxc=vxc_int,
                fam=rho_fam, vxc_fam=vxc_fam,
            )
        if vxc_nlc_int is not None:
            vxc_int = vxc_int + vxc_nlc_int
        vxc = lay.mat_to_mol(vxc_int)

        jk_call = self.jk.get_jk_incr if self.incremental else self.jk.get_jk
        if self.hyb > 0 or self.omega > 0:
            vj, vk = jk_call(dm)
            vk_eff = self.hyb * vk
            if self.omega > 0 and abs(self.alpha - self.hyb) > 1e-12:
                _, vk_lr = jk_call(dm, with_j=False, omega=self.omega)
                vk_eff = vk_eff + (self.alpha - self.hyb) * vk_lr
            veff = vxc + vj - 0.5 * vk_eff
            exc -= 0.25 * float(np.einsum("ij,ij->", dm, vk_eff))
        else:
            vj, _ = jk_call(dm, with_k=False)
            veff = vxc + vj
        self._ecoul = 0.5 * float(np.einsum("ij,ij->", dm, vj))
        self._exc = exc
        return veff

    def energy_elec(self, dm, h, veff):
        return float(np.einsum("ij,ij->", dm, h)) + self._ecoul + self._exc

    def reset_incremental(self):
        super().reset_incremental()
        self._dft_cache = None
        self.dft_block_evals = 0

    def _regrid(self, g):
        """Rebuild a Grids object for the (possibly new) molecule with
        the SAME quadrature spec the user configured (ADVICE r4: a bare
        Grids(self.mol) silently dropped custom n_rad/n_ang/prune)."""
        return Grids(
            self.mol, n_rad=g.n_rad, n_theta=g.n_theta, n_phi=g.n_phi,
            block=g.block, prune=g.prune, n_ang=g.n_ang, angular=g.angular,
        )

    def reset(self, mol=None):
        super().reset(mol)
        self.grids = self._regrid(self.grids)
        if self.nlcgrids is not None:
            self.nlcgrids = self._regrid(self.nlcgrids)
        self.ni = NumInt(self.layout)
        self._scr = None
        self._dft_cache = None
        self._blk_bounds = None
        return self


__all__ = ["RKS"]
