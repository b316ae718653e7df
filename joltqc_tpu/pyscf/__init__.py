"""PySCF adapter: ``joltqc_tpu.pyscf.apply(mf, config)``.

Reference counterpart: /root/reference/jqc/pyscf/__init__.py:121
(``apply(obj, config)`` monkey-patches PySCF/GPU4PySCF RHF/RKS objects so
their hot kernels run on the JIT backend).  Here the same surface patches
a *PySCF* mean-field object so its Fock builds run on TPU through
joltqc_tpu's engines, while PySCF keeps the SCF loop -- preserving the
reference's "unmodified user script" workflow:

    import pyscf, joltqc_tpu.pyscf as jqc
    mf = jqc.apply(pyscf.scf.RHF(mol))
    mf.kernel()

PySCF is NOT bundled in this environment; the module degrades to a clear
ImportError at call time (the standalone drivers joltqc_tpu.scf.RHF/RKS
cover the same capabilities without PySCF).  The conversion and config
plumbing below are unit-tested without pyscf via the Molecule-level
helpers.
"""

from __future__ import annotations

import numpy as np


def get_default_config() -> dict:
    """Mixed-precision defaults (reference: jqc/pyscf/__init__.py:100-118)."""
    return {
        "jk": {"cutoff_fp32": 1e-13, "cutoff_fp64": 1e-6},
        "dft": {"cutoff_fp32": 1e-13, "cutoff_fp64": 1e-6},
    }


def merge_config(config: dict | None) -> dict:
    """Overlay a user config onto the defaults (nested, per-domain)."""
    out = get_default_config()
    for domain, vals in (config or {}).items():
        if domain not in out:
            out[domain] = dict(vals)
        else:
            out[domain].update(vals)
    return out


def molecule_from_pyscf(pmol) -> "Molecule":
    """Convert a built pyscf ``gto.Mole`` to a joltqc_tpu Molecule.

    Shares no code with pyscf -- reads only public Mole attributes."""
    from ..mol.ecp import ECPChannel, ECPData
    from ..mol.molecule import Molecule, Shell

    mol = Molecule(
        atom_symbols=[pmol.atom_symbol(i) for i in range(pmol.natm)],
        coords=np.asarray(pmol.atom_coords()),  # Bohr
        charge=int(pmol.charge),
        spin=int(pmol.spin),
        cart=bool(pmol.cart),
        basis=str(pmol.basis),
    )
    # shells straight from the built _bas table via public accessors
    for ib in range(pmol.nbas):
        l = pmol.bas_angl(ib)
        ia = pmol.bas_atom(ib)
        exps = np.asarray(pmol.bas_exp(ib), np.float64)
        ctr = np.asarray(pmol.bas_ctr_coeff(ib), np.float64)  # (nprim, nctr)
        for c in range(ctr.shape[1]):
            mol.shells.append(
                Shell(l, exps.copy(), ctr[:, c].copy(), mol.coords[ia], ia)
            )
    # ECP blocks (semi-local, PySCF _ecpbas layout)
    if getattr(pmol, "_ecp", None):
        ecp = {}
        for sym in set(mol.atom_symbols):
            if sym not in pmol._ecp:
                continue
            ncore, chans = pmol._ecp[sym]
            channels = []
            for l, prims in chans:
                # prims: [r_power][ [exp, [c0, c1, ...]] ... ] per PySCF
                powers, exps, coefs = [], [], []
                for n, grp in enumerate(prims):
                    for e_c in grp:
                        powers.append(n)
                        exps.append(e_c[0])
                        coefs.append(e_c[1][0] if isinstance(e_c[1], (list, tuple)) else e_c[1])
                channels.append(
                    ECPChannel(
                        l,
                        np.array(powers, int),
                        np.array(exps),
                        np.array(coefs),
                    )
                )
            ecp[sym] = ECPData(ncore=ncore, channels=channels)
        mol.ecp = ecp
    return mol


def apply(mf, config: dict | None = None):
    """Patch a PySCF mean-field object to run its Fock builds on TPU.

    Replaces ``get_jk``/``get_j``/``get_k`` (and for RKS the numint
    ``nr_rks`` path) with closures over joltqc_tpu engines, mirroring the
    reference patch set (jqc/pyscf/__init__.py:191-234)."""
    try:
        import pyscf  # noqa: F401
    except ImportError as e:  # pragma: no cover - no pyscf in CI image
        raise ImportError(
            "joltqc_tpu.pyscf.apply requires pyscf; use the standalone "
            "drivers joltqc_tpu.scf.RHF / RKS instead"
        ) from e

    from ..mol.layout import BasisLayout
    from ..scf.jk_contracted import JKEngine

    cfg = merge_config(config)
    mol = molecule_from_pyscf(mf.mol)
    layout = BasisLayout(mol)
    engine = JKEngine(
        layout,
        cutoff_fp32=cfg["jk"]["cutoff_fp32"],
        cutoff_fp64=cfg["jk"]["cutoff_fp64"],
    )

    def get_jk(mol_=None, dm=None, hermi=1, with_j=True, with_k=True,
               omega=None, **kw):
        dm = np.asarray(dm)
        if dm.ndim == 3:
            outs = [
                engine.get_jk(d, with_j=with_j, with_k=with_k,
                              omega=omega or 0.0)
                for d in dm
            ]
            vj = np.stack([o[0] for o in outs]) if with_j else None
            vk = np.stack([o[1] for o in outs]) if with_k else None
            return vj, vk
        return engine.get_jk(dm, with_j=with_j, with_k=with_k,
                             omega=omega or 0.0)

    mf.get_jk = get_jk
    mf.get_j = lambda *a, dm=None, **k: get_jk(dm=dm, with_k=False)[0]
    mf.get_k = lambda *a, dm=None, **k: get_jk(dm=dm, with_j=False)[1]
    mf._joltqc_tpu = dict(engine=engine, layout=layout, config=cfg)
    return mf


__all__ = ["apply", "get_default_config", "merge_config", "molecule_from_pyscf"]
