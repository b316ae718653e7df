"""Restricted Kohn-Sham DFT driver.

Reference counterpart: /root/reference/jqc/pyscf/rks.py (generate_rks_kernel,
generate_get_veff -- closures patched onto GPU4PySCF RKS objects).  Here
the driver is standalone: it reuses the RHF SCF loop (scf/hf.py) and
overrides ``get_veff``/``energy_elec`` with grid XC + J (+ hybrid K),
mirroring the decomposition of the reference's get_veff
(jqc/pyscf/rks.py:180-262).

Incremental-DFT caching (reference jqc/pyscf/rks.py:290,329-359): rho and
the XC matrix are evaluated on the FULL dm each cycle for now; the
delta-dm incremental path is a planned optimization, not a correctness
feature.
"""

from __future__ import annotations

import numpy as np

from ..dft.grids import Grids
from ..dft.numint import NumInt, eval_rho_all, eval_vxc_mat
from ..dft.xc import eval_xc, hybrid_coeff, is_gga
from .hf import RHF


class RKS(RHF):
    def __init__(
        self,
        mol,
        xc: str = "lda,vwn",
        grids: Grids | None = None,
        nlc=None,
        **kw,
    ):
        super().__init__(mol, **kw)
        self.xc = xc
        self.gga = is_gga(xc)
        self.hyb = hybrid_coeff(xc)
        # nlc: None | True (VV10 defaults b=5.9, C=0.0093) | (b, C)
        self.nlc = (5.9, 0.0093) if nlc is True else nlc
        self.grids = grids if grids is not None else Grids(mol)
        self.ni = NumInt(self.layout)
        self._ecoul = 0.0
        self._exc = 0.0
        self.scf_summary = {}

    def get_veff(self, dm):
        if self.grids.coords is None:
            self.grids.build()
        lay = self.layout
        dm_int = lay.dm_to_internal(np.asarray(dm, np.float64))

        need_grad = self.gga or self.nlc is not None
        rho = eval_rho_all(self.ni, self.grids, dm_int, need_grad)
        sigma = (rho[1:] ** 2).sum(axis=0) if need_grad else None
        e, vr, vs = eval_xc(self.xc, rho[0], sigma if self.gga else None)
        if not self.gga:
            vs = np.zeros_like(vr)

        w = self.grids.weights
        exc = float(np.sum(w * e))
        self._nelec_grid = float(np.sum(w * rho[0]))

        if self.nlc is not None:
            from ..dft.vv10 import nlc_exc_vxc

            b, C = self.nlc
            # VV10 energy uses quadrature weights; restrict to real points
            e_nlc, vr_n, vs_n = nlc_exc_vxc(
                self.grids.coords, w, rho[0], sigma, b, C
            )
            exc += e_nlc
            vr = vr + vr_n
            vs = vs + vs_n

        if need_grad:
            wv = np.concatenate(
                [(w * vr)[None, :], 2.0 * (w * vs)[None, :] * rho[1:]]
            )
        else:
            wv = (w * vr)[None, :]
        vxc_int = eval_vxc_mat(self.ni, self.grids, wv, need_grad)
        vxc = lay.mat_to_mol(vxc_int)

        if self.hyb > 0:
            vj, vk = self.jk.get_jk(dm)
            veff = vxc + vj - 0.5 * self.hyb * vk
            exc -= 0.25 * self.hyb * float(np.einsum("ij,ij->", dm, vk))
        else:
            vj, _ = self.jk.get_jk(dm, with_k=False)
            veff = vxc + vj
        self._ecoul = 0.5 * float(np.einsum("ij,ij->", dm, vj))
        self._exc = exc
        return veff

    def energy_elec(self, dm, h, veff):
        return float(np.einsum("ij,ij->", dm, h)) + self._ecoul + self._exc


__all__ = ["RKS"]
