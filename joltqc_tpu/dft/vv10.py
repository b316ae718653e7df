"""VV10 nonlocal correlation (Vydrov & Van Voorhis 2010) on TPU.

Reference counterpart: /root/reference/jqc/backend/dft/vv10.cu (O(N^2)
pairwise CUDA kernel with shared-memory staging) + host assembly
(backend/rks.py:245-715).  TPU-native redesign:

 - the pairwise energy double-sum runs as a lax.scan over grid blocks of
   the inner index with the outer index vectorized -- dense (B_out, B_in)
   tiles on the VPU, no staging logic;
 - the potentials (vrho, vsigma) come from ``jax.grad`` of the total
   energy instead of hand-derived kernel derivatives -- one formula,
   exact consistency between energy and potential.

Energy:  E = sum_i w_i rho_i [ beta + 0.5 sum_j w_j rho_j Phi_ij ]
  Phi_ij = -1.5 / (g_i g_j (g_i + g_j)),   g_i = omega0_i R_ij^2 + kappa_i
  omega0 = sqrt(C (sigma/rho^2)^2 + (4 pi/3) rho)
  kappa  = b (3 pi/2) (rho / (9 pi))^(1/6)
  beta   = (1/32) (3 / b^2)^(3/4)
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

import jax
import jax.numpy as jnp

_RHO_THRESH = 1e-8


@lru_cache(maxsize=None)
def _vv10_fn(n_blocks: int, block: int, b: float, C: float):
    beta = (1.0 / 32.0) * (3.0 / (b * b)) ** 0.75

    def energy(rho, sigma, coords, w, mask):
        rho_s = jnp.where(mask, rho, 1.0)
        sig_s = jnp.where(mask, sigma, 0.0)
        w_eff = jnp.where(mask, w, 0.0)
        omega0 = jnp.sqrt(
            C * (sig_s / rho_s**2) ** 2 + (4.0 * np.pi / 3.0) * rho_s
        )
        kappa = b * 1.5 * np.pi * (rho_s / (9.0 * np.pi)) ** (1.0 / 6.0)
        wr = w_eff * rho_s  # (N,)

        cb = coords.reshape(n_blocks, block, 3)
        ob = omega0.reshape(n_blocks, block)
        kb = kappa.reshape(n_blocks, block)
        wrb = wr.reshape(n_blocks, block)

        def inner(acc, blk):
            cj, oj, kj, wrj = blk
            R2 = jnp.sum(
                (coords[:, None, :] - cj[None, :, :]) ** 2, axis=-1
            )  # (N, B)
            gi = omega0[:, None] * R2 + kappa[:, None]
            gj = oj[None, :] * R2 + kj[None, :]
            phi = -1.5 / (gi * gj * (gi + gj))
            return acc + phi @ wrj, None

        U, _ = jax.lax.scan(inner, jnp.zeros_like(rho), (cb, ob, kb, wrb))
        return jnp.sum(wr * (beta + 0.5 * U))

    def both(rho, sigma, coords, w, mask):
        e, (vr, vs) = jax.value_and_grad(energy, argnums=(0, 1))(
            rho, sigma, coords, w, mask
        )
        return e, vr, vs

    return jax.jit(both)


def nlc_exc_vxc(coords, weights, rho, sigma, b: float = 5.9, C: float = 0.0093,
                block: int = 2048):
    """VV10 energy + potentials on the (padded) molecular grid.

    coords (N,3), weights/rho/sigma (N,) numpy; N must be a multiple of
    ``block`` (the grid builder pads).  Returns (e_nlc, vrho, vsigma)
    with the quadrature weights DIVIDED OUT of the autodiff gradients, so
    the potentials follow the same unweighted convention as
    ``dft.xc.eval_xc`` (the RKS driver multiplies by w once).
    """
    N = len(weights)
    if N % block:
        pad = (-N) % block
        coords = np.concatenate([coords, np.zeros((pad, 3))])
        weights = np.concatenate([weights, np.zeros(pad)])
        rho = np.concatenate([rho, np.zeros(pad)])
        sigma = np.concatenate([sigma, np.zeros(pad)])
    mask = (rho > _RHO_THRESH) & (weights != 0)
    fn = _vv10_fn(len(weights) // block, block, float(b), float(C))
    e, vr, vs = fn(
        jnp.asarray(rho, jnp.float32),
        jnp.asarray(sigma, jnp.float32),
        jnp.asarray(coords, jnp.float32),
        jnp.asarray(weights, jnp.float32),
        jnp.asarray(mask),
    )
    w_safe = np.where(mask, weights, 1.0)
    vr = np.where(mask, np.asarray(vr, np.float64) / w_safe, 0.0)[:N]
    vs = np.where(mask, np.asarray(vs, np.float64) / w_safe, 0.0)[:N]
    return float(e), vr, vs


def nlc_exc_vxc_np(coords, weights, rho, sigma, b=5.9, C=0.0093):
    """f64 numpy oracle (energy only + FD-checkable potentials by tests)."""
    mask = (rho > _RHO_THRESH) & (weights != 0)
    r = rho[mask]
    s = sigma[mask]
    w = weights[mask]
    c = coords[mask]
    beta = (1.0 / 32.0) * (3.0 / (b * b)) ** 0.75
    omega0 = np.sqrt(C * (s / r**2) ** 2 + (4 * np.pi / 3) * r)
    kappa = b * 1.5 * np.pi * (r / (9 * np.pi)) ** (1.0 / 6.0)
    R2 = ((c[:, None, :] - c[None, :, :]) ** 2).sum(-1)
    gi = omega0[:, None] * R2 + kappa[:, None]
    gj = omega0[None, :] * R2 + kappa[None, :]
    phi = -1.5 / (gi * gj * (gi + gj))
    U = phi @ (w * r)
    return float(np.sum(w * r * (beta + 0.5 * U)))


__all__ = ["nlc_exc_vxc", "nlc_exc_vxc_np"]
