"""Molecular quadrature grids: radial x angular product + Becke weights.

Reference counterpart: jqc/pyscf/rks.py:100-177 (build_grids: PySCF atomic
grids + Becke partition + 1-Bohr box sort).  TPU-first differences:

 - Angular grids are Gauss-Legendre(cos theta) x uniform(phi) product
   grids instead of Lebedev tables: a product rule of ``n_theta`` GL
   nodes and ``2*n_theta`` phi nodes integrates spherical harmonics
   exactly through degree ``2*n_theta - 1`` with no tabulated data, and
   its regular (n_t, n_p) structure maps onto TPU vector lanes.  (~1.5x
   more points than Lebedev at equal degree -- the price of zero tables.)
 - Radial grids are Gauss-Chebyshev (2nd kind) with the Becke rational
   map r = R (1+x)/(1-x).
 - Becke partition-of-unity weights with Bragg-radius size adjustment,
   k=3 smoothing, vectorized over all grid points at once (host numpy,
   one-time O(natm^2 * ngrid)).
 - Points are blocked/padded to a multiple of ``block`` (default 1024)
   and sorted into spatial boxes for locality, mirroring
   ``arg_group_grids`` (jqc/pyscf/rks.py:71-97).
"""

from __future__ import annotations

import numpy as np

from ..mol.molecule import Molecule
from .radii import bragg_radius


def gauss_chebyshev_becke(n: int, R: float):
    """Radial nodes/weights on (0, inf) for integrands ~ f(r) (dr measure).

    Gauss-Chebyshev 2nd kind on (-1,1) + Becke map r = R(1+x)/(1-x):
    returns (r, w) with  integral_0^inf f(r) dr ~= sum w_i f(r_i).
    """
    i = np.arange(1, n + 1)
    theta = i * np.pi / (n + 1)
    x = np.cos(theta)
    # GC2 rule for integral f(x) sqrt(1-x^2) dx; divide by the weight fn
    w_cheb = (np.pi / (n + 1)) * np.sin(theta)  # == w2 / sqrt(1-x^2)
    r = R * (1 + x) / (1 - x)
    drdx = 2.0 * R / (1 - x) ** 2
    return r[::-1], (w_cheb * drdx)[::-1]  # ascending r


def angular_product_grid(n_theta: int, n_phi: int | None = None):
    """Unit-sphere nodes/weights: GL in cos(theta) x uniform phi.

    Exact for spherical harmonics up to degree min(2*n_theta-1, n_phi-1).
    Returns (points (N,3), weights (N,)) with sum(weights) == 4*pi.
    """
    if n_phi is None:
        n_phi = 2 * n_theta
    ct, wt = np.polynomial.legendre.leggauss(n_theta)
    st = np.sqrt(1.0 - ct**2)
    phi = 2.0 * np.pi * (np.arange(n_phi) + 0.5) / n_phi
    wp = 2.0 * np.pi / n_phi
    x = (st[:, None] * np.cos(phi)[None, :]).ravel()
    y = (st[:, None] * np.sin(phi)[None, :]).ravel()
    z = np.broadcast_to(ct[:, None], (n_theta, n_phi)).ravel()
    w = np.broadcast_to((wt * wp)[:, None], (n_theta, n_phi)).ravel()
    return np.stack([x, y, z], axis=1), w.copy()


def _becke_step(mu, a):
    """Size-adjusted smoothing: nu = mu + a(1-mu^2), then k=3 Becke poly."""
    nu = mu + a * (1.0 - mu * mu)
    for _ in range(3):
        nu = 1.5 * nu - 0.5 * nu**3
    return 0.5 * (1.0 - nu)  # cell function s(mu)


def becke_weights(coords_atm, radii, points, atom_of_point):
    """Becke partition-of-unity weight of each point's parent atom."""
    natm = len(coords_atm)
    if natm == 1:
        return np.ones(len(points))
    # pairwise size-adjustment parameters a_ij (Becke 1988 appendix)
    chi = radii[:, None] / radii[None, :]
    u = (chi - 1.0) / (chi + 1.0)
    a = np.clip(u / (u * u - 1.0), -0.5, 0.5)
    np.fill_diagonal(a, 0.0)

    d_pa = np.linalg.norm(points[:, None, :] - coords_atm[None, :, :], axis=2)
    r_ab = np.linalg.norm(coords_atm[:, None, :] - coords_atm[None, :, :], axis=2)
    np.fill_diagonal(r_ab, 1.0)

    P = np.ones((len(points), natm))
    for i in range(natm):
        for j in range(natm):
            if i == j:
                continue
            mu = (d_pa[:, i] - d_pa[:, j]) / r_ab[i, j]
            P[:, i] *= _becke_step(mu, a[i, j])
    Psum = P.sum(axis=1)
    return P[np.arange(len(points)), atom_of_point] / np.maximum(Psum, 1e-300)


class Grids:
    """Molecular integration grid with Becke weights.

    Attributes after build(): ``coords`` (N,3) Bohr, ``weights`` (N,),
    both padded to a multiple of ``block`` (pad weights are 0) and sorted
    into spatial boxes for AO-screening locality.
    """

    def __init__(
        self,
        mol: Molecule,
        n_rad: int = 80,
        n_theta: int = 18,
        n_phi: int | None = None,
        block: int = 1024,
        prune: bool = True,
    ):
        self.mol = mol
        self.n_rad = n_rad
        self.n_theta = n_theta
        self.n_phi = n_phi if n_phi is not None else 2 * n_theta
        self.block = block
        self.prune = prune
        self.coords = None
        self.weights = None

    def build(self):
        mol = self.mol
        zs = mol.atom_charges
        radii = np.array([bragg_radius(z) for z in zs])

        pts_all, w_all, owner = [], [], []
        # tiered angular pruning (the product-grid analogue of PySCF's
        # nwchem_prune, data-free): the density is angularly smooth both
        # in the core (r << R_bragg, dominated by s-like cusp) and in the
        # far tail (r >> R_bragg), so those radial regions use reduced
        # GL x uniform orders.  Region edges in units of the Bragg
        # radius and n_theta fractions mirror the nwchem scheme
        # (reference gets this via PySCF grids, jqc/pyscf/rks.py:100-177).
        if self.prune:
            tiers = ((0.25, 3), (0.5, 2), (4.5, 1), (np.inf, 2))
        else:
            tiers = ((np.inf, 1),)
        ang = {}
        for _, div in tiers:
            if div not in ang:
                nt = max(6, int(round(self.n_theta / div)))
                nph = (
                    2 * nt if self.n_phi == 2 * self.n_theta
                    else max(6, int(round(self.n_phi / div)))
                )
                ang[div] = angular_product_grid(nt, nph)
        for ia in range(mol.natm):
            R = radii[ia] * (0.5 if zs[ia] > 1 else 1.0)
            r, wr = gauss_chebyshev_becke(self.n_rad, R)
            edges = np.array([e for e, _ in tiers]) * radii[ia]
            region = np.searchsorted(edges, r, side="right")
            region = np.minimum(region, len(tiers) - 1)
            for t, (_, div) in enumerate(tiers):
                sel = region == t
                rsel = r[sel]
                if len(rsel) == 0:
                    continue
                s, wa = ang[div]
                p = (
                    mol.coords[ia][None, None, :]
                    + rsel[:, None, None] * s[None, :, :]
                ).reshape(-1, 3)
                w = (rsel**2 * wr[sel])[:, None] * wa[None, :]
                pts_all.append(p)
                w_all.append(w.reshape(-1))
                owner.append(np.full(len(p), ia, np.int32))

        points = np.concatenate(pts_all)
        w_quad = np.concatenate(w_all)
        owner = np.concatenate(owner)

        pw = becke_weights(mol.coords, radii, points, owner)
        weights = w_quad * pw

        # drop negligible points, sort into 2-Bohr boxes for locality
        keep = np.abs(weights) > 1e-16
        points, weights = points[keep], weights[keep]
        box = np.floor(points / 2.0).astype(np.int64)
        key = (box[:, 0] - box[:, 0].min()) * 1_000_000 + (
            box[:, 1] - box[:, 1].min()
        ) * 1_000 + (box[:, 2] - box[:, 2].min())
        order = np.argsort(key, kind="stable")
        points, weights = points[order], weights[order]

        # pad to a block multiple (zero weight)
        n = len(points)
        npad = (-n) % self.block
        if npad:
            points = np.concatenate([points, np.zeros((npad, 3))])
            weights = np.concatenate([weights, np.zeros(npad)])
        self.coords = points
        self.weights = weights
        self.size = n
        return self


__all__ = ["Grids", "gauss_chebyshev_becke", "angular_product_grid", "becke_weights"]
