"""Persistent task-plan cache: round trip and bit-exact reuse.

The headline bench depends on plans surviving process restarts
(utils/plancache.py); these tests pin (a) the npz round trip and (b)
that an engine whose plan was loaded from disk produces bit-identical
J/K to one that built the plan in-process.
"""

import os

import numpy as np
import pytest

from joltqc_tpu.mol import Molecule
from joltqc_tpu.mol.layout import BasisLayout
from joltqc_tpu.scf.jk_contracted import JKEngine
from joltqc_tpu.utils import plancache


@pytest.fixture()
def cache_env(tmp_path, monkeypatch):
    monkeypatch.setenv("JQC_CACHE_DIR", str(tmp_path))
    monkeypatch.setenv("JQC_PLAN_CACHE", "1")
    monkeypatch.setenv("JQC_PLAN_CACHE_MIN_SECS", "0")
    return tmp_path


def _mol():
    return Molecule.from_atom_string(
        "O 0 0 0.1174; H -0.757 0 -0.4696; H 0.757 0 -0.4696",
        basis="6-31g",
    )


def _dm(nao):
    rng = np.random.default_rng(7)
    a = rng.standard_normal((nao, nao)) * 0.1
    return a + a.T


def test_plan_npz_roundtrip(cache_env):
    mol = _mol()
    eng = JKEngine(BasisLayout(mol))
    dm = _dm(eng.layout.mol.nao)
    dm_int = eng.layout.dm_to_internal(dm)
    cond = eng.layout.dm_cond(dm_int)
    D = np.log(np.maximum(cond, 1e-30)).astype(np.float32)
    plan = eng._build_plan(float(D.max()) + 0.7, D + 0.7, 0.0)
    stats = eng.plan_stats
    key = plancache.plan_key(eng, float(D.max()) + 0.7, D + 0.7, 0.0)
    assert key is not None
    plancache.save_plan(key, plan, stats)
    loaded = plancache.load_plan(key)
    assert loaded is not None
    plan2, stats2 = loaded
    assert stats2 == stats
    assert len(plan2) == len(plan)
    for a, b in zip(plan, plan2):
        for f in ("ls", "nprims", "tier", "ntasks", "cls_idx", "accum",
                  "nrows"):
            assert a[f] == b[f], f
        assert a["bound"] == pytest.approx(b["bound"], rel=0, abs=0)
        assert len(a["tasks"]) == len(b["tasks"])
        for x, y in zip(a["tasks"], b["tasks"]):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_engine_reuses_disk_plan_bit_exact(cache_env):
    mol = _mol()
    dm = _dm(mol.nao)

    eng1 = JKEngine(BasisLayout(mol))
    vj1, vk1 = eng1.get_jk(dm)
    plans = os.listdir(os.path.join(str(cache_env), "plans"))
    assert plans, "plan was not persisted"

    # fresh engine, same inputs: plan must come from disk and the result
    # must be bit-identical (same task order, same chunking, same scales)
    eng2 = JKEngine(BasisLayout(mol))
    vj2, vk2 = eng2.get_jk(dm)
    np.testing.assert_array_equal(vj1, vj2)
    np.testing.assert_array_equal(vk1, vk2)


def test_plan_key_sensitivity(cache_env):
    mol = _mol()
    eng = JKEngine(BasisLayout(mol))
    D = np.zeros((len(mol.shells), len(mol.shells)), np.float32)
    k1 = plancache.plan_key(eng, 0.7, D, 0.0)
    k2 = plancache.plan_key(eng, 0.8, D, 0.0)  # different density bound
    k3 = plancache.plan_key(eng, 0.7, D, 0.3)  # different omega
    k4 = plancache.plan_key(eng, 0.7, D + 1.0, 0.0)  # different cond
    assert len({k1, k2, k3, k4}) == 4
    eng2 = JKEngine(BasisLayout(mol), cutoff_fp64=1e-8)
    assert plancache.plan_key(eng2, 0.7, D, 0.0) != k1
