"""Mixed fp32/DF64 numint vs the dense f64 numpy oracle.

Verifies that the DF64 heavy-pair tier (dft/mixed.py) buys back the f32
bulk path's error: the mixed result must be orders of magnitude closer
to the f64 oracle than plain f32 (reference precision spec: the fp64
window of eval_rho.cu:93-106 / rks.py:446-493)."""

import numpy as np
import pytest

from joltqc_tpu.dft.grids import Grids
from joltqc_tpu.dft.mixed import eval_rho_mixed, eval_vxc_mixed
from joltqc_tpu.dft.numint import NumInt, eval_rho_all, eval_vxc_mat
from joltqc_tpu.mol import Molecule
from joltqc_tpu.mol.layout import BasisLayout
from joltqc_tpu.mol.numint_np import eval_rho_np, eval_vxc_np

H2O = "O 0 0 0.1174; H -0.757 0 -0.4696; H 0.757 0 -0.4696"


@pytest.fixture(scope="module")
def setup():
    mol = Molecule.from_atom_string(H2O)
    lay = BasisLayout(mol)
    ni = NumInt(lay, block=256)
    grids = Grids(mol, n_rad=20, n_theta=6, block=256).build()
    rng = np.random.default_rng(7)
    n = lay.nao_int
    dm = rng.standard_normal((n, n)) * 0.3
    dm = dm + dm.T
    return mol, lay, ni, grids, dm


@pytest.mark.parametrize("fam", ["lda", "gga", "mgga"])
def test_rho_mixed_beats_f32(setup, fam):
    mol, lay, ni, grids, dm = setup
    ref = eval_rho_np(lay, grids.coords, dm, fam)
    f32 = eval_rho_all(ni, grids, dm, fam)
    mix = eval_rho_mixed(ni, grids, dm, fam, lay, 1e-6)
    err32 = np.abs(f32 - ref).max()
    errmix = np.abs(mix - ref).max()
    assert errmix < 1e-9, (fam, errmix)
    assert errmix < err32 * 1e-2 or err32 < 1e-9, (err32, errmix)


@pytest.mark.parametrize("fam", ["lda", "gga", "mgga"])
def test_vxc_mixed_beats_f32(setup, fam):
    mol, lay, ni, grids, dm = setup
    rows = {"lda": 1, "gga": 4, "mgga": 5}[fam]
    rng = np.random.default_rng(8)
    wv = rng.standard_normal((rows, len(grids.coords))) * 0.01
    ref = eval_vxc_np(lay, grids.coords, wv, fam)
    f32 = eval_vxc_mat(ni, grids, wv, fam)
    mix = eval_vxc_mixed(ni, grids, wv, fam, lay, 1e-6)
    err32 = np.abs(f32 - ref).max()
    errmix = np.abs(mix - ref).max()
    assert errmix < 1e-9, (fam, errmix)
    assert errmix < err32 * 1e-2 or err32 < 1e-9, (err32, errmix)


def test_rho_mixed_block_sel(setup):
    """block_sel restriction evaluates exactly the selected blocks."""
    mol, lay, ni, grids, dm = setup
    full = eval_rho_mixed(ni, grids, dm, "gga", lay, 1e-6)
    from joltqc_tpu.dft.numint import _blocked

    blocks, N = _blocked(grids.coords, ni.block)
    sel = np.arange(0, len(blocks), 2)
    part = eval_rho_mixed(ni, grids, dm, "gga", lay, 1e-6, block_sel=sel)
    B = ni.block
    for b in range(len(blocks)):
        s = slice(b * B, min((b + 1) * B, N))
        if s.start >= N:
            continue
        if b in sel:
            np.testing.assert_allclose(part[:, s], full[:, s], atol=1e-12)
        else:
            assert np.all(part[:, s] == 0.0)


def test_pair_chunking_parity(setup):
    """The heavy-pair tier is chunked along the pair axis (one unchunked
    launch compiled a 64 GB allocation at 302 AO, round 5); forcing tiny
    chunks must reproduce the single-launch result."""
    import joltqc_tpu.dft.mixed as mixed

    mol, layout, ni, grids, dm_int = setup
    old = mixed._PAIR_CHUNK
    oldb = mixed._BLOCK_CHUNK
    try:
        r1 = mixed.eval_rho_mixed(ni, grids, dm_int, "mgga", layout, 1e-2)
        mixed._PAIR_CHUNK = 16
        mixed._BLOCK_CHUNK = 2
        r2 = mixed.eval_rho_mixed(ni, grids, dm_int, "mgga", layout, 1e-2)
        np.testing.assert_allclose(r1, r2, atol=1e-10)
        rng = np.random.default_rng(3)
        wv = rng.standard_normal((5, len(grids.coords))) * grids.weights
        v2 = mixed.eval_vxc_mixed(ni, grids, wv, "mgga", layout, 1e-2)
        mixed._PAIR_CHUNK = old
        mixed._BLOCK_CHUNK = oldb
        v1 = mixed.eval_vxc_mixed(ni, grids, wv, "mgga", layout, 1e-2)
        np.testing.assert_allclose(v1, v2, atol=1e-10)
    finally:
        mixed._PAIR_CHUNK = old
        mixed._BLOCK_CHUNK = oldb
