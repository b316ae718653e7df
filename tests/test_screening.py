"""Sparse (AO-screened) numint vs the dense path and the f64 oracle.

Reference counterpart: estimate_log_aovalue + nz-list screening tests
(/root/reference/jqc/pyscf/tests/test_rks.py)."""

import numpy as np
import pytest

from joltqc_tpu.dft.grids import Grids
from joltqc_tpu.dft.numint import NumInt, eval_rho_all, eval_vxc_mat
from joltqc_tpu.dft.screening import (
    GridScreening,
    eval_rho_screened,
    eval_vxc_screened,
)
from joltqc_tpu.mol import Molecule
from joltqc_tpu.mol.layout import BasisLayout

# two waters far apart -> real screening sparsity
ATOMS = """O 0 0 0.1174; H -0.757 0 -0.4696; H 0.757 0 -0.4696;
O 8 0 0.1174; H 7.243 0 -0.4696; H 8.757 0 -0.4696"""


@pytest.fixture(scope="module")
def setup():
    mol = Molecule.from_atom_string(ATOMS, basis="6-31g")
    layout = BasisLayout(mol)
    grids = Grids(mol, n_rad=30, n_theta=8, block=256).build()
    ni = NumInt(layout, block=256)
    rng = np.random.default_rng(9)
    d = rng.standard_normal((layout.nao_int, layout.nao_int)) * 0.1
    dm = d + d.T + np.eye(layout.nao_int)
    return ni, grids, dm


@pytest.mark.parametrize("family", ["lda", "gga", "mgga"])
def test_screened_rho_matches_dense(setup, family):
    ni, grids, dm = setup
    scr = GridScreening(ni, grids, thresh=1e-13)
    rho_s = eval_rho_screened(ni, scr, dm, family)
    rho_d = eval_rho_all(ni, grids, dm, family)
    assert scr.fill_fraction < 0.9  # screening actually drops shells
    for r in range(rho_d.shape[0]):
        scale = max(np.abs(rho_d[r]).max(), 1e-10)
        assert np.abs(rho_s[r] - rho_d[r]).max() / scale < 1e-5, r


@pytest.mark.parametrize("family", ["lda", "mgga"])
def test_screened_vxc_matches_dense(setup, family):
    ni, grids, dm = setup
    scr = GridScreening(ni, grids, thresh=1e-13)
    rows = {"lda": 1, "gga": 4, "mgga": 5}[family]
    rng = np.random.default_rng(4)
    wv = rng.standard_normal((rows, len(grids.coords))) * grids.weights
    v_s = eval_vxc_screened(ni, scr, wv, family)
    v_d = eval_vxc_mat(ni, grids, wv, family)
    scale = np.abs(v_d).max()
    assert np.abs(v_s - v_d).max() / scale < 2e-6


def test_dm_cond_l2_pooling():
    """l2_block_pooling parity (reference: linalg_helper.py:214)."""
    from joltqc_tpu.mol import Molecule
    from joltqc_tpu.mol.layout import BasisLayout

    mol = Molecule.from_atom_string(
        "O 0 0 0.1174; H -0.757 0 -0.4696; H 0.757 0 -0.4696", basis="6-31g"
    )
    lay = BasisLayout(mol)
    rng = np.random.default_rng(0)
    nao = lay.nao_int
    dm = rng.standard_normal((nao, nao))
    cond = lay.dm_cond_l2(dm)
    loc = lay.ao_loc_int
    nb = lay.nbas
    ref = np.zeros((nb, nb))
    for i in range(nb):
        for j in range(nb):
            blk = dm[loc[i]:loc[i + 1], loc[j]:loc[j + 1]]
            ref[i, j] = np.sqrt((blk ** 2).sum())
    assert np.allclose(cond, ref)
    # max pooling sanity alongside
    condm = lay.dm_cond(dm)
    assert (cond + 1e-12 >= condm).all()

@pytest.mark.parametrize("family", ["gga"])
def test_screened_block_sel_matches_full(setup, family):
    """block_sel: selected blocks match the full screened eval; others 0."""
    ni, grids, dm = setup
    scr = GridScreening(ni, grids, thresh=1e-13)
    B = ni.block
    nblk = len(scr.blocks)
    sel = np.arange(0, nblk, 2)
    rho_f = eval_rho_screened(ni, scr, dm, family)
    rho_s = eval_rho_screened(ni, scr, dm, family, block_sel=sel)
    npts = rho_f.shape[1]
    for b in range(nblk):
        sl = slice(b * B, min((b + 1) * B, npts))
        if sl.start >= npts:
            break
        if b in sel:
            assert np.allclose(rho_s[:, sl], rho_f[:, sl], atol=1e-12)
        else:
            assert np.all(rho_s[:, sl] == 0.0)

    rows = 4
    rng = np.random.default_rng(4)
    wv = rng.standard_normal((rows, len(grids.coords))) * grids.weights
    # vxc with block_sel == vxc of wv zeroed outside the selection
    wv_masked = wv.copy()
    for b in range(nblk):
        if b not in sel:
            wv_masked[:, b * B : (b + 1) * B] = 0.0
    v_sel = eval_vxc_screened(ni, scr, wv, family, block_sel=sel)
    v_ref = eval_vxc_screened(ni, scr, wv_masked, family)
    scale = max(np.abs(v_ref).max(), 1e-10)
    assert np.abs(v_sel - v_ref).max() / scale < 1e-6


@pytest.mark.slow
def test_rks_mixed_screening_incremental_compose():
    """All three features at once (VERDICT r2 item 5): screening active,
    DF64 tier active, incremental active -- energy still inside the
    1e-8 Ha mixed-precision envelope vs the f64 oracle, and the
    converged tail evaluates fewer grid blocks than full coverage.

    Reference: nz lists + precision windows + incremental caches
    composing in /root/reference/jqc/pyscf/rks.py:329-359."""
    from joltqc_tpu.scf import RKS
    from test_dft_oracle_scf import oracle_rks

    mol = Molecule.from_atom_string(ATOMS, basis="6-31g")
    grids = Grids(mol, n_rad=40, n_theta=10, block=256).build()
    e_ref = oracle_rks(mol, "pbe", grids)
    mf = RKS(mol, xc="pbe", grids=grids, conv_tol=1e-10, max_cycle=40,
             incremental=True)
    mf.ni = NumInt(mf.layout, block=256)
    mf.screen_thresh = 1e-12
    e = mf.kernel()
    assert mf.converged
    scr = mf._screening()
    assert scr is not None, "screening must actually engage"
    assert mf.dft_cutoff_fp64 is not None  # mixed tier on
    assert abs(e - e_ref) < 1e-8, (e, e_ref)
    ncyc = mf.scf_summary["cycles"]
    nblk = len(mf._block_bounds())
    assert mf.dft_block_evals < 2 * ncyc * nblk, (
        mf.dft_block_evals, ncyc, nblk
    )
