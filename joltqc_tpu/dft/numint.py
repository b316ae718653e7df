"""Numerical integration: AO values, density, and Vxc matrix on TPU.

Reference counterpart: /root/reference/jqc/backend/dft/eval_rho.cu,
eval_vxc.cu + wrappers (grid-point-per-thread CUDA with per-block shell
sparsity lists).  TPU-native redesign:

 - grid points are processed in static blocks (default 1024 = 8x128
   sublane/lane tiles);
 - AO values for a block are built per angular-momentum group with
   vectorized radial contractions + cartesian monomials (VPU), giving a
   dense (G, nao) slab;
 - rho and the Vxc matrix are then MXU matmuls:
       rho    = sum_j (ao @ dm) * ao
       V_xc  += ao^T @ (W * ao)   (W folds weights and XC potentials)
   -- the TPU answer to the reference's per-pair CUDA loops: feed the
   systolic array large dense tiles and let padding be masked by zero
   weights/coefficients.
 - per-block partial V/rho are accumulated in DF64 (ops/df64.py), so the
   block-to-block accumulation adds no f32 noise.  Matmuls run at
   precision=HIGHEST.  A full DF64 (Ozaki-split) matmul tier for <=1e-10
   contraction error is the planned fp64 tier (see ops/mxu.py roadmap).

All kernels are shape-static and cached per (l-signature, G, nao).
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np

import jax
import jax.numpy as jnp

from ..mol.layout import BasisLayout
from ..ops import df64 as df
from ..ops.harmonics import cart_components

_HIGH = jax.lax.Precision.HIGHEST


def _group_data(layout: BasisLayout):
    """Per-l shell arrays (padded to common nprim) + AO column indices."""
    mol = layout.mol
    out = []
    for l in layout.ls:
        idx = layout.groups[l]
        pmax = max(mol.shells[int(i)].nprim for i in idx)
        S = len(idx)
        coords = np.zeros((S, 3))
        exps = np.zeros((S, pmax))
        coefs = np.zeros((S, pmax))
        cols = np.zeros(S, np.int32)
        for k, i in enumerate(idx):
            sh = mol.shells[int(i)]
            coords[k] = sh.coord
            exps[k, : sh.nprim] = sh.exps
            coefs[k, : sh.nprim] = sh.coeffs
            cols[k] = layout.ao_loc_int[int(i)]
        out.append((l, coords, exps, coefs, cols))
    return out


@lru_cache(maxsize=None)
def _ao_block_fn(l: int, S: int, P: int, G: int, deriv: int):
    """jitted: grid block (G,3) + group arrays -> ao values (G, S*nf).

    deriv=0: returns (ao,); deriv=1: (ao, dx, dy, dz).
    """
    comps = cart_components(l)
    nf = len(comps)

    def fn(grid, coords, exps, coefs):
        rel = grid[:, None, :] - coords[None, :, :]  # (G,S,3)
        r2 = jnp.sum(rel * rel, axis=-1)  # (G,S)
        ex = jnp.exp(-exps[None, :, :] * r2[:, :, None])  # (G,S,P)
        rad = jnp.sum(coefs[None, :, :] * ex, axis=-1)  # (G,S)
        x, y, z = rel[..., 0], rel[..., 1], rel[..., 2]

        def mono(lx, ly, lz):
            m = jnp.ones_like(r2)
            for v, n in ((x, lx), (y, ly), (z, lz)):
                for _ in range(n):
                    m = m * v
            return m

        aos = [rad * mono(*c) for c in comps]
        ao = jnp.stack(aos, axis=-1).reshape(G, S * nf)
        if deriv == 0:
            return (ao,)

        drad = jnp.sum(-2.0 * exps[None] * coefs[None] * ex, axis=-1)  # (G,S)
        outs = [ao]
        for d, v in enumerate((x, y, z)):
            grads = []
            for lx, ly, lz in comps:
                m = mono(lx, ly, lz)
                g = drad * v * m
                n = (lx, ly, lz)[d]
                if n > 0:
                    lower = [lx, ly, lz]
                    lower[d] -= 1
                    g = g + rad * n * mono(*lower)
                grads.append(g)
            outs.append(jnp.stack(grads, axis=-1).reshape(G, S * nf))
        return tuple(outs)

    return jax.jit(fn)


class NumInt:
    """AO/rho/Vxc evaluator over a BasisLayout (internal cartesian AOs)."""

    def __init__(self, layout: BasisLayout, block: int = 1024):
        self.layout = layout
        self.block = block
        self.nao = layout.nao_int
        self.gdata = _group_data(layout)
        # column scatter: internal AO order is shell order, groups are
        # contiguous per shell -- build a permutation from group-stacked
        # columns to internal AO order
        perm = []
        for l, _, _, _, cols in self.gdata:
            nf = len(cart_components(l))
            for c in cols:
                perm.extend(range(int(c), int(c) + nf))
        self.col_perm = np.argsort(np.array(perm, np.int64)).astype(np.int32)

    # ---------------------------------------------------------------- ao
    def eval_ao_block(self, grid_block, deriv: int = 0):
        """AO (and gradient) values for one grid block, f32 (G, nao)."""
        G = grid_block.shape[0]
        outs = None
        for l, coords, exps, coefs, cols in self.gdata:
            fn = _ao_block_fn(l, len(cols), exps.shape[1], G, deriv)
            res = fn(
                jnp.asarray(grid_block, jnp.float32),
                jnp.asarray(coords, jnp.float32),
                jnp.asarray(exps, jnp.float32),
                jnp.asarray(coefs, jnp.float32),
            )
            outs = res if outs is None else tuple(
                jnp.concatenate([a, b], axis=1) for a, b in zip(outs, res)
            )
        perm = jnp.asarray(self.col_perm)
        return tuple(o[:, perm] for o in outs)


@lru_cache(maxsize=None)
def _rho_block_fn(G: int, nao: int, family: str):
    """family: 'lda' (1 row), 'gga' (4 rows), 'mgga' (5 rows: +tau).

    Row layout follows the reference's eval_rho ndim convention
    (/root/reference/jqc/backend/dft/eval_rho.cu: LDA 1, GGA 4, mGGA 5,
    no laplacian)."""

    def fn(ao, ao1, dm):
        t = jnp.dot(ao, dm, precision=_HIGH)  # (G, nao)
        rho0 = jnp.sum(t * ao, axis=1)
        if family == "lda":
            return rho0[None, :]
        # symmetric dm: grad rho_d = 2 * sum (ao @ dm) * d_ao
        rows = [rho0] + [2.0 * jnp.sum(t * ao1[d], axis=1) for d in range(3)]
        if family == "mgga":
            # tau = 1/2 sum_d (d_ao @ dm) . d_ao
            tau = jnp.zeros_like(rho0)
            for d in range(3):
                td = jnp.dot(ao1[d], dm, precision=_HIGH)
                tau = tau + jnp.sum(td * ao1[d], axis=1)
            rows.append(0.5 * tau)
        return jnp.stack(rows)

    return jax.jit(fn)


@lru_cache(maxsize=None)
def _vxc_block_fn(G: int, nao: int, family: str):
    def fn(ao, ao1, wv):
        # wv rows: [w*vrho] (+ GGA: [2*w*vsigma*rho1_d]) (+ mGGA: [w*vtau])
        mid = ao * (0.5 * wv[0])[:, None]
        if family != "lda":
            for d in range(3):
                mid = mid + ao1[d] * wv[1 + d][:, None]
        half = jnp.dot(ao.T, mid, precision=_HIGH)
        if family == "mgga":
            # V_tau[i,j] = 1/2 sum_d w*vtau * dao_i dao_j; the 0.25 here
            # doubles to 0.5 through the final half + half.T
            for d in range(3):
                half = half + jnp.dot(
                    ao1[d].T, ao1[d] * (0.25 * wv[4])[:, None], precision=_HIGH
                )
        return half + half.T

    return jax.jit(fn)


@lru_cache(maxsize=None)
def _exc_nelec_fn(G: int):
    def fn(w, rho0, e):
        return jnp.sum(w * e), jnp.sum(w * rho0)

    return jax.jit(fn)


def _family_arg(family):
    if isinstance(family, bool):  # back-compat: gga flag
        return "gga" if family else "lda"
    return family


def eval_rho_all(ni: NumInt, grids, dm_int, family):
    """rho rows on the full padded grid: numpy (1 | 4 | 5, N).

    family: 'lda' | 'gga' | 'mgga' (rows: rho; +grad; +tau)."""
    family = _family_arg(family)
    dm32 = jnp.asarray(dm_int, jnp.float32)
    N = len(grids.coords)
    B = ni.block
    rows = {"lda": 1, "gga": 4, "mgga": 5}[family]
    out = np.zeros((rows, N))
    fn = _rho_block_fn(B, ni.nao, family)
    deriv = 0 if family == "lda" else 1
    for s in range(0, N, B):
        blk = grids.coords[s : s + B]
        aos = ni.eval_ao_block(blk, deriv=deriv)
        ao = aos[0]
        ao1 = jnp.stack(aos[1:]) if deriv else jnp.zeros((3, B, ni.nao), jnp.float32)
        out[:, s : s + B] = np.asarray(fn(ao, ao1, dm32), np.float64)
    return out


def eval_vxc_mat(ni: NumInt, grids, wv, family):
    """V_xc matrix from potential rows wv (numpy (1 | 4 | 5, N))."""
    family = _family_arg(family)
    N = len(grids.coords)
    B = ni.block
    fn = _vxc_block_fn(B, ni.nao, family)
    deriv = 0 if family == "lda" else 1
    acc = df.const(0.0, (ni.nao, ni.nao))
    for s in range(0, N, B):
        blk = grids.coords[s : s + B]
        aos = ni.eval_ao_block(blk, deriv=deriv)
        ao = aos[0]
        ao1 = jnp.stack(aos[1:]) if deriv else jnp.zeros((3, B, ni.nao), jnp.float32)
        w32 = jnp.asarray(wv[:, s : s + B], jnp.float32)
        blkmat = fn(ao, ao1, w32)
        acc = df.add(acc, df.from_f32(blkmat))
    return df.to_f64(acc)


__all__ = ["NumInt", "eval_rho_all", "eval_vxc_mat"]
