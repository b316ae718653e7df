"""ECP engine tests: TPU batched kernels vs the f64 numpy oracle + SCF.

Mirrors the reference's test strategy (/root/reference/jqc/pyscf/tests/
test_ecp.py: kernel values vs mol.intor('ECPscalar') at 1e-6 norms,
SCF-level test_dft_ecp.py).  Here the oracle is mol/ecp_np.py (adaptive
f64 quadrature, itself convergence-checked), and the ECP parameters are
synthetic -- integral identities do not care about physicality.
"""

import numpy as np
import pytest

from joltqc_tpu.mol import Molecule
from joltqc_tpu.mol.ecp import parse_nwchem_ecp
from joltqc_tpu.mol.ecp_np import ecp_matrix_np
from joltqc_tpu.mol.layout import BasisLayout
from joltqc_tpu.scf.ecp import ECPEngine

ECP_TXT = """
ECP
O nelec 2
O ul
2 1.24 -2.30
1 4.50 1.10
0 3.00 2.00
O S
2 5.35 10.2
2 1.04 2.29
O P
2 2.45 5.10
END
"""

H_ECP_TXT = """
ECP
H nelec 0
H ul
2 2.0 -1.5
H S
2 3.5 0.8
END
"""


def test_ecp_parser_and_bookkeeping():
    ecp = parse_nwchem_ecp(ECP_TXT)
    assert ecp["O"].ncore == 2
    ls = sorted(c.l for c in ecp["O"].channels)
    assert ls == [-1, 0, 1]
    mol = Molecule.from_atom_string(
        "O 0 0 0; H 0 0 1.9", basis="sto-3g", ecp=ECP_TXT
    )
    assert mol.nelectron == 7  # 8 + 1 - 2 core - 0 charge
    np.testing.assert_allclose(mol.atom_charges_eff, [6.0, 1.0])
    # nuclear repulsion uses effective charges
    assert abs(mol.energy_nuc() - 6.0 * 1.0 / (1.9 / 0.52917721092)) < 1e-10


def test_ecp_engine_vs_oracle_s_only():
    """s-shells only (H2 with an ECP on one H): fast type1+type2 check."""
    mol = Molecule.from_atom_string(
        "H 0 0 0; H 0 0 1.2", basis="sto-3g", ecp=H_ECP_TXT
    )
    lay = BasisLayout(mol)
    V_ref = lay.mat_to_mol(ecp_matrix_np(mol, lay))
    V = ECPEngine(lay).build()
    assert np.abs(V - V_ref).max() < 1e-10, np.abs(V - V_ref).max()


@pytest.mark.slow
def test_ecp_engine_vs_oracle_sp():
    """s+p shells, local + s + p channels, two centers."""
    mol = Molecule.from_atom_string(
        "O 0 0 0; H 0 0 1.9", basis="sto-3g", ecp=ECP_TXT
    )
    lay = BasisLayout(mol)
    V_ref = lay.mat_to_mol(ecp_matrix_np(mol, lay))
    V = ECPEngine(lay).build()
    scale = np.abs(V_ref).max()
    assert np.abs(V - V_ref).max() / scale < 1e-12, np.abs(V - V_ref).max()


def _ecp_energy(atoms, dm):
    mol = Molecule.from_atom_string(atoms, basis="sto-3g", ecp=H_ECP_TXT, unit="bohr")
    lay = BasisLayout(mol)
    return float(np.einsum("ij,ij->", dm, ECPEngine(lay).build()))


@pytest.mark.slow
def test_ecp_gradient_vs_finite_difference():
    """Analytic d/dR of sum_ij dm_ij V_ij (angular-momentum-shift kernels)
    vs central finite differences of the value engine.  Covers dA, dB and
    the translation-invariance ECP-center term (atom 0 carries the ECP;
    atom 1 probes the pure basis-center derivative)."""
    base = np.array([[0.0, 0.0, 0.0], [0.4, -0.3, 2.1]])

    def atoms(c):
        return f"H {c[0,0]} {c[0,1]} {c[0,2]}; H {c[1,0]} {c[1,1]} {c[1,2]}"

    mol = Molecule.from_atom_string(atoms(base), basis="sto-3g",
                                    ecp=H_ECP_TXT, unit="bohr")
    rng = np.random.default_rng(3)
    a = rng.uniform(-1, 1, (mol.nao, mol.nao))
    dm = a + a.T
    lay = BasisLayout(mol)
    grad = ECPEngine(lay).gradient(dm)

    h = 2e-4
    fd = np.zeros_like(grad)
    for ia in range(2):
        for d in range(3):
            cp, cm = base.copy(), base.copy()
            cp[ia, d] += h
            cm[ia, d] -= h
            fd[ia, d] = (_ecp_energy(atoms(cp), dm) - _ecp_energy(atoms(cm), dm)) / (
                2 * h
            )
    assert np.abs(grad - fd).max() < 1e-7, (grad, fd)


SP_BASIS = """BASIS "ao basis"
H    S
      1.3000000              0.8000000
      0.4000000              0.4000000
H    P
      0.7500000              1.0000000
He    S
      1.1000000              0.9000000
      0.3500000              0.3000000
He    P
      0.6500000              1.0000000
END
"""


@pytest.mark.slow
def test_ecp_ip_ipip_vs_finite_difference(tmp_path):
    """First/second derivative matrices vs FD of the value engine.

    Geometry: the ECP sits ONLY on atom 0 (H -- the He atoms have no ECP
    entry); bra shells on atom 1, ket shells on atom 2, so the
    (atom-1, atom-2) matrix block isolates pure bra / ket / mixed
    derivatives.  s+p custom basis exercises the l>0 shift maps."""
    bpath = tmp_path / "sp.dat"
    bpath.write_text(SP_BASIS)
    basis = str(bpath)
    base = np.array([[0.0, 0.0, 0.0], [0.2, -0.4, 1.8], [-0.9, 0.6, -1.3]])
    syms = ["H", "He", "He"]

    def build(c):
        atoms = "; ".join(
            f"{s} {x} {y} {z}" for s, (x, y, z) in zip(syms, c)
        )
        return Molecule.from_atom_string(
            atoms, basis=basis, ecp=H_ECP_TXT, unit="bohr"
        )

    mol = build(base)
    lay = BasisLayout(mol)
    eng = ECPEngine(lay)
    ao_loc = mol.ao_loc
    per_atom = {}
    for ish, sh in enumerate(mol.shells):
        per_atom.setdefault(sh.atom_idx, []).append(ish)
    ao_slices = {
        ia: (
            int(ao_loc[per_atom[ia][0]]),
            int(ao_loc[per_atom[ia][-1] + 1]),
        )
        for ia in range(3)
    }

    def V(c):
        m = build(c)
        return ECPEngine(BasisLayout(m)).build()

    a_lo, a_hi = ao_slices[1]
    b_lo, b_hi = ao_slices[2]
    h = 2e-3

    ip = eng.build_ip()[0]  # ECP atom 0: (3, nao, nao)
    for d in range(2):  # x, y spot-check
        cp, cm = base.copy(), base.copy()
        cp[1, d] += h
        cm[1, d] -= h
        fd = (V(cp) - V(cm))[a_lo:a_hi, b_lo:b_hi] / (2 * h)
        got = ip[d, a_lo:a_hi, b_lo:b_hi]
        assert np.abs(got - fd).max() < 5e-6, (d, np.abs(got - fd).max())

    # ipipv: both derivatives on the bra atom
    ipip = eng.build_ipip("ipipv")[0]  # (9, nao, nao)
    d, e = 0, 2
    cpp, cpm, cmp_, cmm = (base.copy() for _ in range(4))
    cpp[1, d] += h; cpp[1, e] += h
    cpm[1, d] += h; cpm[1, e] -= h
    cmp_[1, d] -= h; cmp_[1, e] += h
    cmm[1, d] -= h; cmm[1, e] -= h
    fd = (V(cpp) - V(cpm) - V(cmp_) + V(cmm))[a_lo:a_hi, b_lo:b_hi] / (4 * h * h)
    got = ipip[3 * d + e, a_lo:a_hi, b_lo:b_hi]
    assert np.abs(got - fd).max() < 5e-5, np.abs(got - fd).max()

    # ipvip: mixed bra/ket derivative
    ipvip = eng.build_ipip("ipvip")[0]
    d, e = 1, 0
    cpp, cpm, cmp_, cmm = (base.copy() for _ in range(4))
    cpp[1, d] += h; cpp[2, e] += h
    cpm[1, d] += h; cpm[2, e] -= h
    cmp_[1, d] -= h; cmp_[2, e] += h
    cmm[1, d] -= h; cmm[2, e] -= h
    fd = (V(cpp) - V(cpm) - V(cmp_) + V(cmm))[a_lo:a_hi, b_lo:b_hi] / (4 * h * h)
    got = ipvip[3 * d + e, a_lo:a_hi, b_lo:b_hi]
    assert np.abs(got - fd).max() < 5e-5, np.abs(got - fd).max()


@pytest.mark.slow
def test_rhf_with_ecp_vs_dense_oracle():
    """Full RHF with the ECP in hcore vs a dense-f64 oracle SCF."""
    from scipy.linalg import eigh

    from joltqc_tpu.mol import intor_np
    from joltqc_tpu.scf import RHF
    from joltqc_tpu.scf.diis import DIIS

    mol = Molecule.from_atom_string(
        "O 0 0 0; H 0 0 1.9", basis="sto-3g", ecp=ECP_TXT
    )
    lay = BasisLayout(mol)
    s = intor_np.overlap(mol)
    h = (
        intor_np.kinetic(mol)
        + intor_np.nuclear(mol)
        + lay.mat_to_mol(ecp_matrix_np(mol, lay))
    )
    eri = intor_np.eri(mol)
    e_nuc = mol.energy_nuc()
    nocc = mol.nelectron // 2
    assert mol.nelectron % 2 == 1  # odd -> shift to even via charge
    mol2 = Molecule.from_atom_string(
        "O 0 0 0; H 0 0 1.9", basis="sto-3g", charge=1, ecp=ECP_TXT
    )
    assert mol2.nelectron == 6

    # dense oracle SCF on mol2 (same integrals; charge only changes nocc)
    nocc = mol2.nelectron // 2
    _, c = eigh(h, s)
    dm = 2.0 * c[:, :nocc] @ c[:, :nocc].T
    diis = DIIS()
    e_last = 0.0
    for cycle in range(60):
        vj = np.einsum("ijkl,kl->ij", eri, dm)
        vk = np.einsum("ikjl,kl->ij", eri, dm)
        f = h + vj - 0.5 * vk
        e_tot = float(
            np.einsum("ij,ij->", dm, h)
            + 0.5 * np.einsum("ij,ij->", dm, vj - 0.5 * vk)
        ) + e_nuc
        fd = diis.update(s, dm, f)
        _, c = eigh(fd, s)
        dm = 2.0 * c[:, :nocc] @ c[:, :nocc].T
        if abs(e_tot - e_last) < 1e-11 and cycle > 0:
            break
        e_last = e_tot

    mf = RHF(mol2, conv_tol=1e-11)
    e = mf.kernel()
    assert mf.converged
    assert abs(e - e_tot) < 1e-7, (e, e_tot)

# Production-grade ECP fixture: the Na 10-core-electron ECP used by the
# reference's own test suite (/root/reference/jqc/pyscf/tests/test_ecp.py
# setUpModule, originally from GPU4PySCF gpu4pyscf/gto/tests/test_ecp.py
# -- public test data).  Channels ul + S..G exercise every semi-local
# angular momentum the engine supports (lc <= 4).
NA_ECP_TXT = """
ECP
Na nelec 10
Na ul
2       1.0                   0.5
Na S
2      13.652203             732.2692
2       6.826101              26.484721
Na P
2      10.279868             299.489474
2       5.139934              26.466234
Na D
2       7.349859             124.457595
2       3.674929              14.035995
Na F
2       3.034072              21.531031
Na G
2       4.808857             -21.607597
END
"""

NA_BASIS_TXT = """
BASIS "ao basis" PRINT
Na    S
      1.8        0.4
      0.6        0.7
Na    S
      0.25       1.0
Na    P
      0.9        1.0
Na    D
      0.5        1.0
"""


@pytest.fixture(scope="module")
def na2(tmp_path_factory):
    path = tmp_path_factory.mktemp("basis") / "na_valence.dat"
    path.write_text(NA_BASIS_TXT)
    return Molecule.from_atom_string(
        "Na 0.5 0.5 0; Na 0 1.0 1.0", basis=str(path), ecp=NA_ECP_TXT,
        unit="angstrom",
    )


@pytest.mark.slow
def test_na2_full_channel_ecp_matrix_vs_oracle(na2):
    """All ECP channels (ul + S..G) x d-function basis, engine vs the
    adaptive-quadrature oracle (reference accuracy bar: 1e-6 norms,
    ref test_ecp.py:120-190)."""
    lay = BasisLayout(na2)
    V = ECPEngine(lay).build()
    V_ref = lay.mat_to_mol(ecp_matrix_np(na2, lay))
    assert np.abs(V - V_ref).max() < 1e-6, np.abs(V - V_ref).max()


@pytest.mark.slow
def test_na2_rhf_with_production_ecp(na2):
    """SCF-level ECP run with realistic multi-channel data (VERDICT r2
    item 7): full RHF through the production engine vs a dense-f64
    oracle SCF with the quadrature-oracle ECP matrix."""
    from scipy.linalg import eigh

    from joltqc_tpu.mol import intor_np
    from joltqc_tpu.scf import RHF
    from joltqc_tpu.scf.diis import DIIS

    mol = na2
    assert mol.nelectron == 2  # 2 x (11 - 10 core)
    lay = BasisLayout(mol)
    s = intor_np.overlap(mol)
    h = (
        intor_np.kinetic(mol)
        + intor_np.nuclear(mol)
        + lay.mat_to_mol(ecp_matrix_np(mol, lay))
    )
    eri = intor_np.eri(mol)
    e_nuc = mol.energy_nuc()
    nocc = mol.nelectron // 2
    _, c = eigh(h, s)
    dm = 2.0 * c[:, :nocc] @ c[:, :nocc].T
    diis = DIIS()
    e_last = 0.0
    for cycle in range(60):
        vj = np.einsum("ijkl,kl->ij", eri, dm)
        vk = np.einsum("ikjl,kl->ij", eri, dm)
        f = h + vj - 0.5 * vk
        e_tot = float(
            np.einsum("ij,ij->", dm, h)
            + 0.5 * np.einsum("ij,ij->", dm, vj - 0.5 * vk)
        ) + e_nuc
        fd = diis.update(s, dm, f)
        _, c = eigh(fd, s)
        dm = 2.0 * c[:, :nocc] @ c[:, :nocc].T
        if abs(e_tot - e_last) < 1e-11 and cycle > 0:
            break
        e_last = e_tot

    mf = RHF(mol, conv_tol=1e-11)
    e = mf.kernel()
    assert mf.converged
    assert abs(e - e_tot) < 1e-7, (e, e_tot)
