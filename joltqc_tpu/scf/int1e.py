"""Device one-electron integrals: overlap, kinetic, nuclear attraction.

The reference delegates S / T / V_nuc to PySCF's C integral library
(jqc patches only get_jk/veff; hcore stays PySCF --
/root/reference/jqc/pyscf/__init__.py keeps mf.get_hcore untouched).
This framework is standalone, and the numpy oracle (mol/intor_np.py)
is a Python-loop reference implementation that scales as
O(nshell^2 * nprim^2 * nf^2 * natm) interpreted operations -- minutes at
~500 AOs.  This module is the production path: the same class-batched,
scalarized McMurchie-Davidson machinery as the ERI engine (ops/md.py),
evaluated on device in DF64 (~1e-14 relative), with pair tasks chunked
through jitted lax.scan bodies and accumulated with the deterministic
integer-limb scatter.

Formulas (McMurchie-Davidson, E = Hermite expansion coefficients):
  S_ij  = cc (pi/p)^{3/2} Ex(ix,jx,0) Ey(iy,jy,0) Ez(iz,jz,0)
  T_ij  = cc (pi/p)^{3/2} sum_d t1d(d) prod_{d'!=d} E(d')(0)
          t1d(i,j) = -2 b^2 E(i,j+2,0) + b(2j+1) E(i,j,0)
                     - j(j-1)/2 E(i,j-2,0)        (b = ket exponent)
  V_ij  = -cc (2 pi/p) sum_C Z_C sum_tuv Ex(t) Ey(u) Ez(v) R_tuv(p, P-C)
matching the numpy oracle (mol/intor_np.py:142-212) which the unit tests
pin this module against.
"""

from __future__ import annotations

import math
from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from ..mol.layout import BasisLayout
from ..ops import df64 as df
from ..ops.accum import limbs_to_df64, scatter_limbs
from ..ops.arith import get_arith
from ..ops.harmonics import cart_components
from ..ops.md import _e_rows, e_scalar, make_pair_data_c, r_scalar, tri_set
from .tasks import build_pair_classes, build_shell_classes


def _nf(l):
    return len(cart_components(l))


def _take(tbl, idx):
    if isinstance(tbl, df.DF64):
        return df.DF64(jnp.take(tbl.hi, idx, axis=0), jnp.take(tbl.lo, idx, axis=0))
    return jnp.take(tbl, idx, axis=0)


def _mulseq(ar, parts, shape):
    """Product of scalar-dict values with _ONE/None sentinel handling."""
    from ..ops.md import _ONE

    if any(p is None for p in parts):
        return None
    real = [p for p in parts if p is not _ONE]
    if not real:
        return ar.const(1.0, shape)
    acc = real[0]
    for p in real[1:]:
        acc = ar.mul(acc, p)
    return acc


@lru_cache(maxsize=None)
def _int1e_chunk_fn(kind, ls, nprims, nao, natm):
    """Jitted chunk scan for one pair class: accumulates into limb-exact
    DF64 (nao*nao,) like the JK engine.  kind in ('ovlp', 'kin', 'nuc')
    or 'stv' (all three in ONE compiled scan -- one XLA compile per pair
    class instead of three; compiles through the PJRT tunnel are the
    scarce resource)."""
    from ..ops.md import _ONE

    kinds = ("ovlp", "kin", "nuc") if kind == "stv" else (kind,)
    ar = get_arith("df64")
    li, lj = ls
    npi, npj = nprims
    L = li + lj
    ci_comps = cart_components(li)
    cj_comps = cart_components(lj)
    nfi, nfj = len(ci_comps), len(cj_comps)
    tri, _ = tri_set(L)

    def pair_rows(tbl_i, tbl_j, ia, ja):
        """Yield per-primitive-slot scalar data for the chunk batch."""
        coord_i = _take(tbl_i[0], ia)
        coord_j = _take(tbl_j[0], ja)
        exps_i, coefs_i = _take(tbl_i[1], ia), _take(tbl_i[2], ia)
        exps_j, coefs_j = _take(tbl_j[1], ja), _take(tbl_j[2], ja)
        Ac = tuple(coord_i[:, d] for d in range(3))
        Bc = tuple(coord_j[:, d] for d in range(3))
        for pi in range(npi):
            for pj in range(npj):
                a = exps_i[:, pi]
                b = exps_j[:, pj]
                cc = df.mul(coefs_i[:, pi], coefs_j[:, pj])
                yield Ac, Bc, a, b, cc

    def chunk(carry, t):
        accs, tbl_i, tbl_j, atoms = carry
        ia, ja, w = t
        T = ia.shape[0]
        shape = (T,)
        vals = {k: [None] * (nfi * nfj) for k in kinds}

        def addv(knd, f, v):
            cur = vals[knd]
            cur[f] = v if cur[f] is None else df.add(cur[f], v)

        for Ac, Bc, a, b, cc in pair_rows(tbl_i, tbl_j, ia, ja):
            pd = make_pair_data_c(ar, Ac, Bc, a, b, cc)
            p = pd["p"]
            inv_p = ar.recip(p)
            inv2p = ar.scale_pow2(inv_p, 0.5)
            if "kin" in kinds:
                Ex = e_scalar(ar, li, lj + 2, inv2p, pd["xpa"][0],
                              pd["xpb"][0], seed=pd["epref"])
                Ey = e_scalar(ar, li, lj + 2, inv2p, pd["xpa"][1], pd["xpb"][1])
                Ez = e_scalar(ar, li, lj + 2, inv2p, pd["xpa"][2], pd["xpb"][2])
                pref = ar.mul(
                    cc, ar.mul(ar.const(math.pi, shape) * inv_p,
                               ar.sqrt(ar.const(math.pi, shape) * inv_p)),
                )

                def t1d(E, i, j, bexp):
                    terms = []
                    e2 = E.get((i, j + 2, 0))
                    if e2 is not None:
                        bb = ar.mul_f32(ar.mul(bexp, bexp), -2.0)
                        terms.append(bb if e2 is _ONE else ar.mul(bb, e2))
                    e0 = E.get((i, j, 0))
                    if e0 is not None:
                        bf = ar.mul_f32(bexp, float(2 * j + 1))
                        terms.append(bf if e0 is _ONE else ar.mul(bf, e0))
                    if j >= 2:
                        em = E.get((i, j - 2, 0))
                        if em is not None:
                            c = -0.5 * j * (j - 1)
                            terms.append(
                                ar.const(c, shape) if em is _ONE
                                else ar.mul_f32(em, c)
                            )
                    if not terms:
                        return None
                    acc_t = terms[0]
                    for tt in terms[1:]:
                        acc_t = ar.add(acc_t, tt)
                    return acc_t

                for fi, (ix, iy, iz) in enumerate(ci_comps):
                    for fj, (jx, jy, jz) in enumerate(cj_comps):
                        sx = Ex.get((ix, jx, 0))
                        sy = Ey.get((iy, jy, 0))
                        sz = Ez.get((iz, jz, 0))
                        tx = t1d(Ex, ix, jx, b)
                        ty = t1d(Ey, iy, jy, b)
                        tz = t1d(Ez, iz, jz, b)
                        tot = None
                        for trip in ((tx, sy, sz), (sx, ty, sz), (sx, sy, tz)):
                            v = _mulseq(ar, list(trip), shape)
                            if v is not None:
                                tot = v if tot is None else ar.add(tot, v)
                        if tot is not None:
                            addv("kin", fi * nfj + fj, ar.mul(tot, pref))
            if "ovlp" not in kinds and "nuc" not in kinds:
                continue

            rows, nf_pair, NT = _e_rows(
                ar, li, lj, inv2p, pd["xpa"], pd["xpb"], pd["epref"]
            )
            if "ovlp" in kinds:
                pref = ar.mul(
                    cc, ar.mul(ar.const(math.pi, shape) * inv_p,
                               ar.sqrt(ar.const(math.pi, shape) * inv_p)),
                )
                for f in range(nf_pair):
                    e = rows[f * NT]  # tri_set[0] == (0,0,0)
                    if e is None:
                        continue
                    addv("ovlp", f, pref if e is _ONE else ar.mul(e, pref))
            if "nuc" in kinds:
                # -2 pi as a DF64 constant: an f32-rounded factor would
                # poison the whole V matrix at 6e-8 relative
                pref = ar.mul(
                    cc, ar.mul(inv_p, ar.const(-2.0 * math.pi, shape))
                )
                Pc = pd["P"]

                def atom_body(carry_rows, xc):
                    Cx, Cy, Cz, Z = xc
                    PC = (ar.sub(Pc[0], Cx), ar.sub(Pc[1], Cy),
                          ar.sub(Pc[2], Cz))
                    r2 = ar.add(
                        ar.add(ar.mul(PC[0], PC[0]), ar.mul(PC[1], PC[1])),
                        ar.mul(PC[2], PC[2]),
                    )
                    boys = ar.boys(L, ar.mul(p, r2))
                    R = r_scalar(ar, L, p, PC, boys)
                    new = []
                    for f in range(nf_pair):
                        acc_f = carry_rows[f]
                        s = None
                        for k, tuv in enumerate(tri):
                            e = rows[f * NT + k]
                            if e is None:
                                continue
                            r = R[tuv]
                            term = r if e is _ONE else ar.mul(e, r)
                            s = term if s is None else ar.add(s, term)
                        if s is not None:
                            acc_f = df.add(acc_f, df.mul_f32(ar.mul(s, pref), Z))
                        new.append(acc_f)
                    return new, None

                zero = df.const(0.0, shape)
                init = [zero] * nf_pair
                out_rows, _ = jax.lax.scan(atom_body, init, atoms)
                for f in range(nf_pair):
                    addv("nuc", f, out_rows[f])

        # scatter each kind's (T, nfi*nfj) block into its nao^2 limb acc
        ao_i = jnp.take(tbl_i[3], ia)
        ao_j = jnp.take(tbl_j[3], ja)
        idx = (
            (ao_i[:, None, None] + jnp.arange(nfi)[None, :, None]) * nao
            + ao_j[:, None, None]
            + jnp.arange(nfj)[None, None, :]
        ).reshape(T, nfi * nfj)
        zero = df.const(0.0, (T,))
        new_accs = []
        for knd, acc in zip(kinds, accs):
            vk = vals[knd]
            stacked = df.DF64(
                jnp.stack([zero.hi if v is None else v.hi for v in vk], -1),
                jnp.stack([zero.lo if v is None else v.lo for v in vk], -1),
            )
            stacked = df.mul_f32(stacked, w[:, None])
            limbs, sexp = scatter_limbs(
                df.DF64(stacked.hi.reshape(-1), stacked.lo.reshape(-1)),
                idx.reshape(-1),
                nao * nao,
            )
            new_accs.append(df.add(acc, limbs_to_df64(limbs, sexp)))
        return (tuple(new_accs), tbl_i, tbl_j, atoms), None

    def fn(tbl_i, tbl_j, atoms, tasks, accs):
        (accs, _, _, _), _ = jax.lax.scan(
            chunk, (accs, tbl_i, tbl_j, atoms), tasks
        )
        return accs

    return jax.jit(fn, donate_argnums=(4,))


class Int1eEngine:
    """Class-batched device S/T/V builder over a BasisLayout."""

    def __init__(self, layout: BasisLayout, chunk: int = 2048):
        self.layout = layout
        self.nao = layout.nao_int
        self.chunk = chunk
        self.classes = build_shell_classes(layout, merge_nprim=True)
        self.pair_classes = build_pair_classes(self.classes)
        self._tables = None
        mol = layout.mol
        coords = np.asarray(mol.coords, np.float64)
        z = np.asarray(mol.atom_charges_eff, np.float64)
        cx, cy, cz = (df.from_f64(coords[:, d]) for d in range(3))
        self._atoms = (cx, cy, cz, jnp.asarray(z, jnp.float32))
        self.natm = len(z)

    def _tbl(self, k):
        if self._tables is None:
            self._tables = [
                (
                    df.from_f64(c.coords),
                    df.from_f64(c.exps),
                    df.from_f64(c.coefs),
                    jnp.asarray(c.ao, jnp.int32),
                )
                for c in self.classes
            ]
        return self._tables[k]

    def _run(self, kind: str):
        nao = self.nao
        nk = 3 if kind == "stv" else 1
        accs = tuple(df.const(0.0, (nao * nao,)) for _ in range(nk))
        for pc in self.pair_classes:
            c1, c2 = self.classes[pc.ci], self.classes[pc.cj]
            P = pc.npair
            B = min(self.chunk, 1 << int(np.ceil(np.log2(max(P, 64)))))
            nchunk = -(-P // B)
            pad = nchunk * B - P
            # pads -> the in-range zero-coef pad shell (index nshell-1):
            # out-of-range indices hit jnp.take's NaN-fill semantics
            ii = np.concatenate(
                [pc.i_loc, np.full(pad, c1.nshell - 1, np.int32)])
            jj = np.concatenate(
                [pc.j_loc, np.full(pad, c2.nshell - 1, np.int32)])
            w = np.concatenate(
                [np.where(pc.diag, 0.5, 1.0), np.zeros(pad)]
            ).astype(np.float32)
            tasks = (
                jnp.asarray(ii.reshape(nchunk, B), jnp.int32),
                jnp.asarray(jj.reshape(nchunk, B), jnp.int32),
                jnp.asarray(w.reshape(nchunk, B)),
            )
            fn = _int1e_chunk_fn(
                kind, (c1.l, c2.l), (c1.nprim, c2.nprim), nao, self.natm
            )
            accs = fn(
                self._tbl(pc.ci), self._tbl(pc.cj), self._atoms, tasks, accs
            )

        def unfold(acc):
            m = df.to_f64(acc).reshape(nao, nao)
            m = m + m.T  # diag pairs carry weight 0.5
            return self.layout.mat_to_mol(m)

        out = tuple(unfold(a) for a in accs)
        return out if kind == "stv" else out[0]

    def overlap(self) -> np.ndarray:
        return self._run("ovlp")

    def kinetic(self) -> np.ndarray:
        return self._run("kin")

    def nuclear(self) -> np.ndarray:
        return self._run("nuc")

    def stv(self):
        """(S, T, V) in one compiled scan per pair class."""
        return self._run("stv")

    def hcore(self) -> np.ndarray:
        return self.kinetic() + self.nuclear()


__all__ = ["Int1eEngine"]
