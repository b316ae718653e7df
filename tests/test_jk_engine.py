"""JK engine vs oracle + end-to-end RHF energies.

Mirrors the reference test strategy (/root/reference/jqc/pyscf/tests/
test_jk.py: random SPD dm, vj/vk vs CPU oracle at 1e-7 FP64 / 1e-3 FP32;
test_scf.py: total energies vs hardcoded references)."""

import numpy as np
import pytest

from joltqc_tpu.mol import Molecule
from joltqc_tpu.mol import intor_np
from joltqc_tpu.scf import RHF, JKEngine
from joltqc_tpu.mol.layout import BasisLayout

H2O = """O  0.0000000000 -0.0000000000  0.1174000000
H -0.7570000000 -0.0000000000 -0.4696000000
H  0.7570000000  0.0000000000 -0.4696000000"""


def _rand_sym_dm(nao, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.uniform(-1, 1, (nao, nao))
    return a + a.T


def _ref_jk(mol, dm):
    g = intor_np.eri(mol)
    vj = np.einsum("ijkl,kl->ij", g, dm)
    vk = np.einsum("ikjl,kl->ij", g, dm)
    return vj, vk


def test_jk_vs_oracle_mixed():
    # (oracle ERI in pure python is only fast enough for sto-3g; larger
    # bases are covered through the RHF literature-energy tests)
    mol = Molecule.from_atom_string(H2O, basis="sto-3g")
    dm = _rand_sym_dm(mol.nao)
    vj_ref, vk_ref = _ref_jk(mol, dm)
    eng = JKEngine(BasisLayout(mol), cutoff_fp32=1e-14, cutoff_fp64=1e-7)
    vj, vk = eng.get_jk(dm)
    assert np.abs(vj - vj_ref).max() < 1e-6, np.abs(vj - vj_ref).max()
    assert np.abs(vk - vk_ref).max() < 1e-6, np.abs(vk - vk_ref).max()


def test_jk_fp64_tier_accuracy():
    mol = Molecule.from_atom_string(H2O, basis="sto-3g")
    dm = _rand_sym_dm(mol.nao, seed=3)
    vj_ref, vk_ref = _ref_jk(mol, dm)
    # force everything into the DF64 tier
    eng = JKEngine(BasisLayout(mol), cutoff_fp32=1e-30, cutoff_fp64=1e-30)
    vj, vk = eng.get_jk(dm)
    assert np.abs(vj - vj_ref).max() < 1e-9, np.abs(vj - vj_ref).max()
    assert np.abs(vk - vk_ref).max() < 1e-9, np.abs(vk - vk_ref).max()


def test_jk_fp32_tier_accuracy():
    mol = Molecule.from_atom_string(H2O, basis="sto-3g")
    dm = _rand_sym_dm(mol.nao, seed=4)
    vj_ref, vk_ref = _ref_jk(mol, dm)
    # force everything into the f32 tier
    eng = JKEngine(BasisLayout(mol), cutoff_fp32=1e-14, cutoff_fp64=1e30)
    vj, vk = eng.get_jk(dm)
    assert np.abs(vj - vj_ref).max() < 1e-3
    assert np.abs(vk - vk_ref).max() < 1e-3


def test_jk_omega_long_range():
    """erf(omega*r)/r kernel vs the numpy oracle (reference counterpart:
    test_jk.py omega cases, /root/reference/jqc/pyscf/tests/test_jk.py:187)."""
    omega = 0.3
    mol = Molecule.from_atom_string(H2O, basis="sto-3g")
    dm = _rand_sym_dm(mol.nao, seed=5)
    g = intor_np.eri(mol, omega=omega)
    vj_ref = np.einsum("ijkl,kl->ij", g, dm)
    vk_ref = np.einsum("ikjl,kl->ij", g, dm)
    eng = JKEngine(BasisLayout(mol), cutoff_fp32=1e-30, cutoff_fp64=1e-30)
    vj, vk = eng.get_jk(dm, omega=omega)

    def _diag():  # forensics for a rare all-zeros flake (plan/bound state)
        plan = getattr(eng, "_plans_full", {}).get(omega, ([],))[0]
        return (
            f"stats={eng.plan_stats}\n"
            f"bounds={[(e['ls'], e['tier'], e['ntasks'], float(e['bound'])) for e in plan]}\n"
            f"qmax={[float(pc.q_log.max()) for pc in eng.pair_classes]}\n"
            f"qomax={[{k: float(v.max()) for k, v in pc.q_omega.items()} for pc in eng.pair_classes]}"
        )

    if np.abs(vj).max() == 0.0:  # rare flake: full forensics to stdout
        print("FLAKE DIAG\n", _diag(), flush=True)
        vj_r, _ = eng.get_jk(dm, omega=omega)  # same engine, warm kernels
        print("FLAKE same-engine rerun |vj| =", np.abs(vj_r).max(), flush=True)
        eng_f = JKEngine(BasisLayout(mol), cutoff_fp32=1e-30,
                         cutoff_fp64=1e-30)
        vj_f, _ = eng_f.get_jk(dm, omega=omega)  # fresh engine+plan
        print("FLAKE fresh-engine rerun |vj| =", np.abs(vj_f).max(),
              flush=True)
        vj_0, _ = eng.get_jk(dm)  # omega=0 on the same engine
        print("FLAKE omega=0 same engine |vj| =", np.abs(vj_0).max(),
              flush=True)
    assert np.abs(vj - vj_ref).max() < 1e-9, (
        np.abs(vj - vj_ref).max(), np.abs(vj).max())
    assert np.abs(vk - vk_ref).max() < 1e-9, np.abs(vk - vk_ref).max()
    # and the mixed tier stays within the f32 envelope
    eng2 = JKEngine(BasisLayout(mol), cutoff_fp32=1e-14, cutoff_fp64=1e-7)
    vj2, vk2 = eng2.get_jk(dm, omega=omega)
    assert np.abs(vj2 - vj_ref).max() < 1e-5
    assert np.abs(vk2 - vk_ref).max() < 1e-5


def test_jk_hermi0_nonsymmetric_dm():
    """Non-symmetric dm (hermi=0): K(dm) = sym-part + antisym P - P^T
    unfolding (reference counterpart: dm/dm^T stacking,
    /root/reference/jqc/pyscf/jk.py:189-192)."""
    mol = Molecule.from_atom_string(H2O, basis="sto-3g")
    rng = np.random.default_rng(11)
    dm = rng.uniform(-1, 1, (mol.nao, mol.nao))  # NOT symmetric
    g = intor_np.eri(mol)
    vj_ref = np.einsum("ijkl,kl->ij", g, dm)
    vk_ref = np.einsum("ikjl,kl->ij", g, dm)
    eng = JKEngine(BasisLayout(mol), cutoff_fp32=1e-30, cutoff_fp64=1e-30)
    vj, vk = eng.get_jk(dm, hermi=0)
    assert np.abs(vj - vj_ref).max() < 1e-9, np.abs(vj - vj_ref).max()
    assert np.abs(vk - vk_ref).max() < 1e-9, np.abs(vk - vk_ref).max()


def test_jk_multi_dm():
    """Stacked density matrices (reference: n_dm > 1, test_jk.py:123)."""
    mol = Molecule.from_atom_string(H2O, basis="sto-3g")
    dms = np.stack([_rand_sym_dm(mol.nao, seed=s) for s in (1, 2)])
    g = intor_np.eri(mol)
    eng = JKEngine(BasisLayout(mol), cutoff_fp32=1e-30, cutoff_fp64=1e-30)
    vj, vk = eng.get_jk(dms)
    assert vj.shape == dms.shape
    for i in range(2):
        assert np.abs(vj[i] - np.einsum("ijkl,kl->ij", g, dms[i])).max() < 1e-9
        assert np.abs(vk[i] - np.einsum("ikjl,kl->ij", g, dms[i])).max() < 1e-9


def test_rhf_h2o_sto3g():
    mol = Molecule.from_atom_string(H2O, basis="sto-3g")
    mf = RHF(mol, conv_tol=1e-11)
    e = mf.kernel()
    assert mf.converged
    # all-float64 oracle value (verified on TPU to 1e-9)
    assert abs(e - (-74.9630631297)) < 1e-7, e


def test_rhf_incremental_matches_direct():
    """Incremental direct-SCF (delta-dm Fock builds, exact by linearity)
    reproduces the standard path (reference: incremental/direct-SCF ddm,
    jqc/pyscf/rks.py:290)."""
    mol = Molecule.from_atom_string(H2O, basis="sto-3g")
    e_ref = RHF(mol, conv_tol=1e-11).kernel()
    mf = RHF(mol, conv_tol=1e-11, incremental=True)
    e = mf.kernel()
    assert mf.converged
    assert abs(e - e_ref) < 1e-9, (e, e_ref)


@pytest.mark.slow
def test_rhf_h2o_631g():
    mol = Molecule.from_atom_string(H2O, basis="6-31g")
    mf = RHF(mol, conv_tol=1e-11)
    e = mf.kernel()
    assert mf.converged
    # all-float64 oracle value for this geometry
    assert abs(e - (-75.9839484981)) < 1e-6, e


def test_jk_block_accumulation_matches_scatter():
    """Tile-grouped MXU block accumulation == per-element scatter path.

    Both accumulate exactly (error-free limb decompositions + integer
    adds), so they must agree to DF64 reassembly precision; each path is
    individually deterministic (bitwise-stable across runs)."""
    mol = Molecule.from_atom_string(H2O, basis="6-31g")
    dm = _rand_sym_dm(mol.nao, seed=5)
    lay = BasisLayout(mol)
    eng_s = JKEngine(lay, cutoff_fp32=1e-14, cutoff_fp64=1e-7)
    eng_b = JKEngine(lay, cutoff_fp32=1e-14, cutoff_fp64=1e-7,
                     accum="block", tile=4)
    vj_s, vk_s = eng_s.get_jk(dm)
    vj_b, vk_b = eng_b.get_jk(dm)
    assert any(e.get("accum") == "block" for e in eng_b._plan)
    scale = max(np.abs(vj_s).max(), 1.0)
    assert np.abs(vj_b - vj_s).max() < 1e-11 * scale
    assert np.abs(vk_b - vk_s).max() < 1e-11 * scale
    vj_b2, vk_b2 = eng_b.get_jk(dm)
    assert np.array_equal(vj_b, vj_b2) and np.array_equal(vk_b, vk_b2)


def test_jk_tile_accumulation_matches_scatter():
    """Fused contract+tile accumulation (scatter-free dense E-space
    assembly, ops/accum_tile.py) == per-element scatter path.

    The tile path's contraction rounds per f32/DF64 op like the scatter
    path's, and its accumulation is exact (integer limb tiles + 0/1 fold
    matmuls), so the two agree to reassembly precision; the tile path is
    bitwise-deterministic across runs."""
    mol = Molecule.from_atom_string(H2O, basis="6-31g")
    dm = _rand_sym_dm(mol.nao, seed=6)
    lay = BasisLayout(mol)
    eng_s = JKEngine(lay, cutoff_fp32=1e-14, cutoff_fp64=1e-7)
    eng_t = JKEngine(lay, cutoff_fp32=1e-14, cutoff_fp64=1e-7,
                     accum="tile", tile_w=8)
    vj_s, vk_s = eng_s.get_jk(dm)
    vj_t, vk_t = eng_t.get_jk(dm)
    assert any(e.get("accum") == "tile" for e in eng_t._plan)
    scale = max(np.abs(vj_s).max(), 1.0)
    assert np.abs(vj_t - vj_s).max() < 1e-9 * scale
    assert np.abs(vk_t - vk_s).max() < 1e-9 * scale
    vj_t2, vk_t2 = eng_t.get_jk(dm)
    assert np.array_equal(vj_t, vj_t2) and np.array_equal(vk_t, vk_t2)


def test_jk_tile_vs_oracle_sto3g():
    """Tile path straight against the dense numpy ERI oracle."""
    mol = Molecule.from_atom_string(H2O, basis="sto-3g")
    dm = _rand_sym_dm(mol.nao, seed=7)
    vj_ref, vk_ref = _ref_jk(mol, dm)
    eng = JKEngine(BasisLayout(mol), cutoff_fp32=1e-14, cutoff_fp64=1e-7,
                   accum="tile", tile_w=8)
    vj, vk = eng.get_jk(dm)
    assert np.abs(vj - vj_ref).max() < 1e-6, np.abs(vj - vj_ref).max()
    assert np.abs(vk - vk_ref).max() < 1e-6, np.abs(vk - vk_ref).max()


def test_multi_dm_tile_accumulation():
    """Batched n_dm on the TILE path: one ERI pass per class, n_dm fused
    contract+tile-accumulate passes (VERDICT r3 item 9 -- the fast
    accumulator must not force the scatter fallback for dm stacks)."""
    mol = Molecule.from_atom_string(H2O, basis="6-31g")
    rng = np.random.default_rng(11)
    nao = mol.nao
    dms = np.stack([
        (lambda a: a + a.T)(rng.uniform(-1, 1, (nao, nao)))
        for _ in range(2)
    ])
    lay = BasisLayout(mol)
    eng_t = JKEngine(lay, cutoff_fp32=1e-14, cutoff_fp64=1e-7,
                     accum="tile", tile_w=8)
    vj_b, vk_b = eng_t.get_jk(dms)
    assert any(e.get("accum") == "tile" for e in eng_t._plan)
    eng_s = JKEngine(lay, cutoff_fp32=1e-14, cutoff_fp64=1e-7)
    for d in range(2):
        vj_1, vk_1 = eng_s.get_jk(dms[d])
        scale = max(np.abs(vj_1).max(), 1.0)
        assert np.abs(vj_b[d] - vj_1).max() < 1e-9 * scale
        assert np.abs(vk_b[d] - vk_1).max() < 1e-9 * scale


def test_multi_dm_batched_vs_looped():
    """Batched n_dm path (one ERI pass, n_dm contractions) vs per-dm calls.

    Reference: n_dm as a kernel template arg (backend/jk_1qnt.py)."""
    from joltqc_tpu.mol import Molecule, intor_np
    from joltqc_tpu.mol.layout import BasisLayout
    from joltqc_tpu.scf.jk_contracted import JKEngine

    mol = Molecule.from_atom_string(
        "O 0 0 0.1174; H -0.757 0 -0.4696; H 0.757 0 -0.4696", basis="sto-3g"
    )
    rng = np.random.default_rng(5)
    nao = mol.nao
    dms = np.stack([
        (lambda a: a + a.T)(rng.uniform(-1, 1, (nao, nao))) for _ in range(3)
    ])
    eng = JKEngine(BasisLayout(mol), cutoff_fp32=1e-30, cutoff_fp64=1e-30)
    vj_b, vk_b = eng.get_jk(dms)
    assert vj_b.shape == (3, nao, nao)
    g = intor_np.eri(mol)
    for d in range(3):
        vj_ref = np.einsum("ijkl,kl->ij", g, dms[d])
        vk_ref = np.einsum("ijkl,jk->il", g, dms[d])
        assert np.abs(vj_b[d] - vj_ref).max() < 1e-9
        assert np.abs(vk_b[d] - vk_ref).max() < 1e-9


def test_multi_dm_hermi0_batched():
    """Non-symmetric dm through the batched sym+antisym pass."""
    from joltqc_tpu.mol import Molecule, intor_np
    from joltqc_tpu.mol.layout import BasisLayout
    from joltqc_tpu.scf.jk_contracted import JKEngine

    mol = Molecule.from_atom_string(
        "O 0 0 0.1174; H -0.757 0 -0.4696; H 0.757 0 -0.4696", basis="sto-3g"
    )
    rng = np.random.default_rng(6)
    nao = mol.nao
    dm = rng.uniform(-1, 1, (nao, nao))  # not symmetric
    eng = JKEngine(BasisLayout(mol), cutoff_fp32=1e-30, cutoff_fp64=1e-30)
    vj, vk = eng.get_jk(dm, hermi=0)
    g = intor_np.eri(mol)
    vj_ref = np.einsum("ijkl,kl->ij", g, 0.5 * (dm + dm.T))
    vk_ref = np.einsum("ijkl,jk->il", g, dm)
    assert np.abs(vj - vj_ref).max() < 1e-9
    assert np.abs(vk - vk_ref).max() < 1e-9
