"""Native (C++) fused task screen vs the numpy reference path.

Reference counterpart: the screening kernel tests implicit in
/root/reference/jqc/pyscf/tests/test_jk.py (task routing correctness is
asserted through vj/vk parity); here the native screen is checked
directly for bit-identical task lists, weights, and tier routing."""

import numpy as np
import pytest

from joltqc_tpu.native import get_lib, screen_tasks_native
from joltqc_tpu.scf.tasks import build_quartet_tasks


class _PC:
    def __init__(self, q, diag):
        self.q_log = q
        self.diag = diag


def _numpy_ref(q1, q2, si1, sj1, si2, sj2, d1, d2, D, same,
               log32_gen, log64_gen, log32_abs, log64_abs):
    p1 = _PC(q1, d1)
    p2 = _PC(q2, d2)
    t1, t2, w, tier64 = build_quartet_tasks(p1, p2, same, log32_gen, log64_gen)
    i, j = si1[t1], sj1[t1]
    k, ll = si2[t2], sj2[t2]
    dmx = np.maximum.reduce(
        [D[i, j], D[k, ll], D[i, k], D[i, ll], D[j, k], D[j, ll]]
    )
    dq = q1[t1] + q2[t2] + dmx
    keep = dq > log32_abs
    t1, t2, w, dq = t1[keep], t2[keep], w[keep], dq[keep]
    tier64 = dq > log64_abs
    out = {}
    for name, sel in (("f32", ~tier64), ("df64", tier64)):
        out[name] = (t1[sel], t2[sel], w[sel].astype(np.float32),
                     float(dq[sel].max()) if sel.any() else -1e30)
    return out


@pytest.mark.parametrize("same", [False, True])
def test_native_screen_matches_numpy(same):
    if get_lib() is None:
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(7 + same)
    P1, P2, nbas = 400, 400 if same else 333, 24
    q1 = np.sort(rng.uniform(-20, 0, P1).astype(np.float32))[::-1].copy()
    q2 = q1 if same else np.sort(
        rng.uniform(-20, 0, P2).astype(np.float32))[::-1].copy()
    # -1 = pad-shell sentinel (numpy wraps to the last row; the native
    # screen must match, not read out of bounds)
    si1 = rng.integers(-1, nbas, P1).astype(np.int32)
    sj1 = rng.integers(-1, nbas, P1).astype(np.int32)
    si2 = si1 if same else rng.integers(-1, nbas, P2).astype(np.int32)
    sj2 = sj1 if same else rng.integers(-1, nbas, P2).astype(np.int32)
    d1 = rng.random(P1) < 0.2
    d2 = d1 if same else rng.random(P2) < 0.2
    D = rng.uniform(-8, 2, (nbas, nbas)).astype(np.float32)
    log32_gen, log64_gen = -25.0, -10.0
    log32_abs, log64_abs = -30.0, -16.0

    res = screen_tasks_native(
        q1, q2, q1, q2, si1, sj1, si2, sj2, d1, d2, D, same,
        log32_gen, log64_gen, log32_abs, log64_abs,
    )
    assert res is not None
    f32t, df64t, cand, cand64 = res
    ref = _numpy_ref(q1, q2, si1, sj1, si2, sj2, d1, d2, D, same,
                     log32_gen, log64_gen, log32_abs, log64_abs)
    for name, got in (("f32", f32t), ("df64", df64t)):
        rt1, rt2, rw, rdq = ref[name]
        assert np.array_equal(got[0], rt1), name
        assert np.array_equal(got[1], rt2), name
        assert np.array_equal(got[2], rw), name
        if len(rt1):
            assert abs(got[3] - rdq) < 1e-5, name
    # candidate stats match the pre-refinement generation counts
    t1g, _, _, tier64g = build_quartet_tasks(
        _PC(q1, d1), _PC(q2, d2), same, log32_gen, log64_gen
    )
    assert cand == len(t1g)
    assert cand64 == int(tier64g.sum())


def test_native_screen_engine_parity():
    """Full engine: native-screened plan == numpy-screened plan output."""
    if get_lib() is None:
        pytest.skip("native toolchain unavailable")
    import joltqc_tpu.scf.jk_contracted as jkc
    from joltqc_tpu.mol import Molecule
    from joltqc_tpu.mol.layout import BasisLayout
    from joltqc_tpu.scf.jk_contracted import JKEngine

    mol = Molecule.from_atom_string(
        "O 0 0 0.1174; H -0.757 0 -0.4696; H 0.757 0 -0.4696", basis="sto-3g"
    )
    rng = np.random.default_rng(0)
    a = rng.uniform(-1, 1, (mol.nao, mol.nao))
    dm = a + a.T
    vj_n, vk_n = JKEngine(BasisLayout(mol)).get_jk(dm)

    import joltqc_tpu.native as nat

    saved = nat._lib, nat._tried
    nat._lib, nat._tried = None, True  # force the numpy fallback
    try:
        vj_p, vk_p = JKEngine(BasisLayout(mol)).get_jk(dm)
    finally:
        nat._lib, nat._tried = saved
    assert np.array_equal(vj_n, vj_p)
    assert np.array_equal(vk_n, vk_p)
