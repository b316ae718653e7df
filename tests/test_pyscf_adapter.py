"""PySCF adapter plumbing tests (pyscf itself is absent in this image).

The conversion/monkey-patch path requires pyscf and is exercised by
examples/README instructions; here we pin the config semantics and the
import-gating behavior (reference counterpart: get_default_config,
/root/reference/jqc/pyscf/__init__.py:100-118)."""

import pytest

from joltqc_tpu.pyscf import apply, get_default_config, merge_config


def test_default_config():
    cfg = get_default_config()
    assert cfg["jk"] == {"cutoff_fp32": 1e-13, "cutoff_fp64": 1e-6}
    assert cfg["dft"] == {"cutoff_fp32": 1e-13, "cutoff_fp64": 1e-6}


def test_merge_config_overlays_nested():
    cfg = merge_config({"jk": {"cutoff_fp64": 1e-8}})
    assert cfg["jk"]["cutoff_fp64"] == 1e-8
    assert cfg["jk"]["cutoff_fp32"] == 1e-13  # untouched default
    assert cfg["dft"]["cutoff_fp64"] == 1e-6
    # unknown domains pass through
    cfg = merge_config({"ecp": {"x": 1}})
    assert cfg["ecp"] == {"x": 1}


def test_apply_requires_pyscf():
    try:
        import pyscf  # noqa: F401

        pytest.skip("pyscf available; gating path not applicable")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="standalone"):
        apply(object())


def _stub_mf(xc=None, with_ecp=False):
    """A stub mean-field object shaped like a PySCF RHF/RKS."""
    import numpy as np

    from joltqc_tpu.mol import Molecule

    ecp_txt = """
ECP
O nelec 2
O ul
2 1.24 -2.30
END
""" if with_ecp else None
    mol = Molecule.from_atom_string(
        "O 0 0 0.1174; H -0.757 0 -0.4696; H 0.757 0 -0.4696",
        basis="sto-3g", ecp=ecp_txt,
    )

    class Grids:
        coords = None
        weights = None

        def build(self):
            from joltqc_tpu.dft.grids import Grids as G

            g = G(mol, n_rad=20, n_theta=6)
            g.build()
            self.coords, self.weights = g.coords, g.weights
            return self

    class NumInt:
        pass

    class MF:
        def __init__(self):
            self.mol = mol
            if xc is not None:
                self.xc = xc
                self.grids = Grids()
                self._numint = NumInt()
            self._reset_calls = 0

        def reset(self, mol_new=None):
            self._reset_calls += 1
            return self

        def as_scanner(self):
            return lambda m: 0.0

    return MF()


def test_apply_patches_full_rks_surface():
    """The adapter must mirror the reference patch list
    (jqc/pyscf/__init__.py:191-252): get_jk/get_j/get_k, numint nr_rks/
    get_rho/nr_nlc_vxc, grids.build, reset/as_scanner wrapping."""
    import numpy as np

    from joltqc_tpu.pyscf import _apply_patches

    mf = _stub_mf(xc="pbe")
    _apply_patches(mf)
    for name in ("get_jk", "get_j", "get_k"):
        assert callable(getattr(mf, name))
    for name in ("nr_rks", "get_rho", "nr_nlc_vxc"):
        assert callable(getattr(mf._numint, name))
    assert mf._joltqc_wrapped

    # positional PySCF calling conventions must work
    n = mf.mol.nao
    rng = np.random.default_rng(0)
    dm = rng.standard_normal((n, n)) * 0.1
    dm = dm + dm.T
    vj = mf.get_j(mf.mol, dm, 1)
    vk = mf.get_k(mf.mol, dm, 1)
    vj2, vk2 = mf.get_jk(mf.mol, dm, 1)
    np.testing.assert_allclose(vj, vj2, atol=1e-12)
    np.testing.assert_allclose(vk, vk2, atol=1e-12)

    # hermi=0 with a non-symmetric dm must route through the engine's
    # non-symmetric path (ADVICE round-1: hermi was swallowed)
    dm_ns = rng.standard_normal((n, n)) * 0.1
    _, vk_ns = mf.get_jk(mf.mol, dm_ns, 0)
    _, vk_sym = mf.get_jk(mf.mol, 0.5 * (dm_ns + dm_ns.T), 1)
    assert not np.allclose(vk_ns, vk_sym)

    # grids.build is replaced by the box-sorted TPU builder
    g = mf.grids.build()
    assert g.coords is not None and len(g.weights) == len(g.coords)

    # nr_rks returns the PySCF (nelec, excsum, vmat) contract
    nelec, excsum, vmat = mf._numint.nr_rks(mf.mol, mf.grids, "pbe", dm)
    assert vmat.shape == (n, n)
    assert np.isfinite(excsum)

    # reset re-applies the patches (geometry-optimizer workflow)
    mf.reset()
    assert mf._reset_calls == 1
    assert mf._joltqc_wrapped


def test_get_veff_rhf_incremental_semantics():
    """PySCF calls mf.get_veff(mol, dm, dm_last, vhf_last) positionally
    in the direct-SCF loop (scf/hf.py); with direct_scf the adapter must
    evaluate J/K on the DELTA density and add vhf_last (reference:
    jqc/pyscf/jk.py:78-90)."""
    import numpy as np

    from joltqc_tpu.pyscf import _apply_patches

    mf = _stub_mf()
    mf.direct_scf = True
    _apply_patches(mf)
    n = mf.mol.nao
    rng = np.random.default_rng(1)
    dm0 = rng.standard_normal((n, n)) * 0.1
    dm0 = dm0 + dm0.T
    dm1 = dm0 + 0.02 * np.eye(n)

    vhf0 = mf.get_veff(mf.mol, dm0)
    vj1, vk1 = mf.get_jk(mf.mol, dm1, 1)
    direct = vj1 - 0.5 * vk1
    incr = mf.get_veff(mf.mol, dm1, dm0, vhf0, 1)
    np.testing.assert_allclose(incr, direct, atol=1e-10)
    # PySCF's defaults are dm_last=0, vhf_last=0 -- must be accepted
    base = mf.get_veff(mf.mol, dm1, 0, 0, 1)
    np.testing.assert_allclose(base, direct, atol=1e-10)


def test_get_veff_rks_tags_and_increment():
    """RKS veff must return PySCF-style tags (ecoul/exc/vj/vk) and the
    tagged-vhf_last incremental path must reproduce the direct build
    (reference: jqc/pyscf/rks.py:180-263)."""
    import numpy as np

    from joltqc_tpu.pyscf import _apply_patches

    mf = _stub_mf(xc="b3lyp")
    mf.direct_scf = True
    _apply_patches(mf)
    n = mf.mol.nao
    rng = np.random.default_rng(2)
    dm0 = rng.standard_normal((n, n)) * 0.1
    dm0 = dm0 + dm0.T
    dm1 = dm0 + 0.02 * np.eye(n)

    v0 = mf.get_veff(mf.mol, dm0)
    for tag in ("ecoul", "exc", "vj", "vk"):
        assert hasattr(v0, tag), tag
    assert np.isfinite(v0.ecoul)
    v1_incr = mf.get_veff(mf.mol, dm1, dm0, v0, 1)
    v1_direct = mf.get_veff(mf.mol, dm1)
    np.testing.assert_allclose(
        np.asarray(v1_incr), np.asarray(v1_direct), atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(v1_incr.vj), np.asarray(v1_direct.vj), atol=1e-8
    )


def test_apply_patches_ecp_intor_routing():
    import numpy as np

    from joltqc_tpu.pyscf import _apply_patches

    mf = _stub_mf(with_ecp=True)
    calls = []
    mf.mol.intor = lambda key, *a, **k: calls.append(key) or None
    _apply_patches(mf)
    mat = mf.mol.intor("ECPscalar")
    assert mat.shape == (mf.mol.nao, mf.mol.nao)
    assert np.isfinite(mat).all() and np.abs(mat).max() > 0
    # non-ECP keys still route to the original intor
    mf.mol.intor("int1e_ovlp")
    assert calls == ["int1e_ovlp"]
