"""Chemistry sidecar tests: integrals/RHF vs textbook values, JW vs
Slater-Condon cross-checks (the physics-oracle strategy of SURVEY.md section
4)."""

import numpy as np
import pytest

from anqs_quantum_chemistry_tpu.chem import fci as fci_mod
from anqs_quantum_chemistry_tpu.chem.basis import (
    basis_for_atoms,
    nuclear_repulsion,
)
from anqs_quantum_chemistry_tpu.chem.integrals import compute_integrals_ao
from anqs_quantum_chemistry_tpu.chem.jw import (
    jordan_wigner_pauli_hamiltonian,
    words_to_ints,
    z_string_symmetries,
)
from anqs_quantum_chemistry_tpu.chem.molecule import Molecule, MolConfig
from anqs_quantum_chemistry_tpu.chem.scf import rhf


@pytest.fixture(scope="module")
def h2():
    return Molecule(MolConfig(name="H2", basis="sto-3g"))


@pytest.fixture(scope="module")
def lih():
    return Molecule(MolConfig(name="LiH", basis="sto-3g"))


def test_atomic_rhf_textbook_values():
    # Closed-shell atoms have exact published STO-3G RHF energies.
    for el, ne, lit in [
        ("He", 2, -2.807784),
        ("Be", 4, -14.351880),
        ("Ne", 10, -126.604525),
    ]:
        atoms = [(el, (0.0, 0.0, 0.0))]
        shells = basis_for_atoms(atoms, "sto-3g")
        ints = compute_integrals_ao(atoms, shells)
        res = rhf(ints["S"], ints["T"] + ints["V"], ints["ERI"], ne, 0.0)
        assert res["converged"]
        assert abs(res["hf_energy"] - lit) < 2e-5, el


def test_h2_energies(h2):
    assert abs(h2.hf_energy - (-1.11668)) < 1e-4
    assert abs(h2.fci_energy - (-1.13727)) < 1e-4
    # CISD == FCI for 2 electrons.
    assert abs(h2.cisd_energy - h2.fci_energy) < 1e-10
    # MP2 between HF and FCI.
    assert h2.fci_energy < h2.mp2_energy < h2.hf_energy


def test_lih_energies(lih):
    assert abs(lih.hf_energy - (-7.86203)) < 1e-4
    assert abs(lih.fci_energy - (-7.88241)) < 1e-4
    assert lih.fci_energy <= lih.cisd_energy < lih.hf_energy


def test_h2o_energies():
    mol = Molecule(MolConfig(name="H2O", basis="sto-3g"))
    assert abs(mol.hf_energy - (-74.96302)) < 1e-4
    assert mol.fci_energy < mol.cisd_energy < mol.mp2_energy < mol.hf_energy


def test_jw_matches_slater_condon(h2, lih):
    for mol, (na, nb) in [(h2, (1, 1)), (lih, (2, 2))]:
        n_so = mol.qubit_num
        dets = fci_mod.sector_determinants(n_so, na, nb)
        if len(dets) > 50:
            dets = dets[::5]
        h_sc = fci_mod.sparse_hamiltonian(dets, mol.h1, mol.v).toarray()
        h_jw = np.array(
            [
                [mol.qubit_ham.dense_matrix_element(x, y) for x in dets]
                for y in dets
            ]
        )
        np.testing.assert_allclose(
            h_sc + np.eye(len(dets)) * mol.e_nuc, h_jw, atol=1e-12
        )


def test_hf_det_diagonal_matches_hf_energy(lih):
    """<HF|H|HF> must equal the SCF energy (canonical orbitals)."""
    e_diag = fci_mod.diagonal_energy(lih.hf_det, lih.h1, lih.v) + lih.e_nuc
    assert abs(e_diag - lih.hf_energy) < 1e-9


def test_z_string_symmetries_commute(lih):
    ham = lih.qubit_ham
    gens = z_string_symmetries(ham)
    assert len(gens) >= 2  # at least alpha/beta parity for a real molecule
    a_ints = words_to_ints(ham.a_masks)
    for g in gens:
        g_int = sum(1 << i for i in range(len(g)) if g[i])
        overlaps = np.array(
            [bin(int(a) & g_int).count("1") % 2 for a in a_ints]
        )
        assert not overlaps.any()
    # HF determinant defines the sector eigenvalues; every FCI-support det
    # must share them (symmetry of the ground state).
    e, dets, coef, _ = fci_mod.fci_ground_state(
        lih.h1, lih.v, lih.n_alpha, lih.n_beta, lih.e_nuc
    )
    big = np.abs(coef) > 1e-8
    for g in gens:
        g_int = sum(1 << i for i in range(len(g)) if g[i])
        ref = bin(lih.hf_det & g_int).count("1") % 2
        for d, keep in zip(dets, big):
            if keep:
                assert bin(d & g_int).count("1") % 2 == ref


def test_symplectic_symmetries_commute(lih):
    """Full symplectic-kernel generators (X/Y/Z-bearing Pauli strings)
    commute with every Hamiltonian term; the Z-string generators are the
    x=0 subset of the same kernel."""
    from anqs_quantum_chemistry_tpu.chem.jw import symplectic_symmetries

    ham = lih.qubit_ham
    gx, gz = symplectic_symmetries(ham)
    assert gx.shape == gz.shape and gx.shape[1] == ham.qubit_num
    zg = z_string_symmetries(ham)
    # The kernel contains at least the Z-strings (x=0 solutions).
    assert gx.shape[0] >= zg.shape[0] >= 2

    # Independent exact oracle: Pauli strings (x1,z1), (x2,z2) commute
    # iff x1.z2 + z1.x2 = 0 mod 2, computed here with python-int popcounts
    # over per-term masks.
    a_ints = words_to_ints(ham.a_masks)
    b_ints = words_to_ints(ham.b_words)
    group_id = np.repeat(
        np.arange(ham.n_groups), np.diff(ham.group_starts).astype(int)
    )
    term_a = [int(a_ints[g]) for g in group_id]
    for k in range(gx.shape[0]):
        x_int = sum(1 << i for i in range(ham.qubit_num) if gx[k, i])
        z_int = sum(1 << i for i in range(ham.qubit_num) if gz[k, i])
        assert x_int or z_int  # nonzero generator
        for t in range(ham.n_terms):
            sym = (
                bin(term_a[t] & z_int).count("1")
                + bin(int(b_ints[t]) & x_int).count("1")
            ) % 2
            assert sym == 0, (k, t)
    # Every Z-string solves the full kernel condition too (sanity link
    # between the two finders).
    for g in zg:
        z_int = sum(1 << i for i in range(len(g)) if g[i])
        for t in range(ham.n_terms):
            assert bin(term_a[t] & z_int).count("1") % 2 == 0


def test_nuclear_repulsion():
    atoms = [("H", (0.0, 0.0, 0.0)), ("H", (0.0, 0.0, 2.0))]
    assert abs(nuclear_repulsion(atoms) - 0.5) < 1e-12


def test_631g_li_be_b_f():
    """6-31G data for the second-row gap elements (round-2 addition).

    Be atom RHF/6-31G = -14.566764 Ha (published closed-shell atomic value);
    molecular checks: the bigger basis lowers the variational HF energy.
    """
    import numpy as np

    from anqs_quantum_chemistry_tpu.chem.basis import basis_for_atoms
    from anqs_quantum_chemistry_tpu.chem.integrals import compute_integrals_ao
    from anqs_quantum_chemistry_tpu.chem.scf import rhf

    atoms = [("Be", (0.0, 0.0, 0.0))]
    ints = compute_integrals_ao(atoms, basis_for_atoms(atoms, "6-31g"))
    res = rhf(ints["S"], ints["T"] + ints["V"], ints["ERI"], 4, 0.0)
    assert res["converged"]
    np.testing.assert_allclose(res["hf_energy"], -14.566764, atol=2e-6)

    from anqs_quantum_chemistry_tpu.chem.molecule import Molecule, MolConfig

    for name in ("LiH", "BeH2"):
        small = Molecule.create(
            MolConfig(name=name), mols_dir="mols",
            run_fci=False, run_cisd=False,
        )
        big = Molecule.create(
            MolConfig(name=name, basis="6-31g"), mols_dir="mols",
            run_fci=False, run_cisd=False,
        )
        assert big.hf_energy < small.hf_energy
        assert big.qubit_num > small.qubit_num


def test_631g_star_d_shells():
    """6-31G* Cartesian 6d polarization shells: H2O RHF matches the
    textbook value (-76.011 at standard geometries) and the polarization
    lowering vs plain 6-31G is the expected ~25-30 mHa."""
    from anqs_quantum_chemistry_tpu.chem.molecule import Molecule, MolConfig

    m1 = Molecule.create(
        MolConfig(name="H2O", basis="6-31g"), mols_dir="mols",
        run_fci=False, run_cisd=False,
    )
    m2 = Molecule.create(
        MolConfig(name="H2O", basis="6-31g*"), mols_dir="mols",
        run_fci=False, run_cisd=False,
    )
    assert m2.qubit_num == m1.qubit_num + 12  # two 6d shells (O only... C?)
    assert abs(m2.hf_energy - -76.0105) < 2e-3
    lowering = m1.hf_energy - m2.hf_energy
    assert 0.02 < lowering < 0.035


def test_rohf_open_shell():
    """ROHF for open-shell systems: the SCF energy must equal the HF
    determinant expectation <det|H|det> of the JW Hamiltonian built from
    the same orbitals (single-determinant consistency across the whole
    integrals -> SCF -> spin-orbital -> JW pipeline), and the variational
    ladder FCI <= CISD <= ROHF must hold in the (N_alpha, N_beta) sector."""
    from anqs_quantum_chemistry_tpu.chem import fci as fci_mod
    from anqs_quantum_chemistry_tpu.chem.molecule import Molecule, MolConfig

    for name, mult in (("Li", 2), ("OH", 2)):
        mol = Molecule.create(
            MolConfig(name=name), mols_dir="mols", run_fci=False,
            run_cisd=False,
        )
        assert mol.multiplicity == mult
        assert mol.n_alpha - mol.n_beta == mult - 1
        e_det = mol.qubit_ham.dense_matrix_element(mol.hf_det, mol.hf_det)
        np.testing.assert_allclose(e_det, mol.hf_energy, atol=1e-8)

        e_fci, _, _, _ = fci_mod.fci_ground_state(
            mol.h1, mol.v, mol.n_alpha, mol.n_beta, mol.e_nuc
        )
        e_cisd, _, _ = fci_mod.cisd_ground_state(
            mol.h1, mol.v, mol.hf_det, mol.e_nuc
        )
        assert e_fci <= e_cisd + 1e-9 <= mol.hf_energy + 2e-9
        # Correlation energy is small but nonzero for these systems.
        assert 1e-5 < mol.hf_energy - e_fci < 0.5


def test_spherical_d_transform():
    """Pure (spherical-harmonic) d shells: for a single-primitive d shell
    on one center the 5 solid harmonics are mutually orthogonal with the
    analytic diagonal-overlap ratios [1, 1, 3, 1, 3] (in the shared-
    shell-norm convention); needed for the reference's SPHERICAL Cr
    SV/vdz basis (reference run_pyscf.py:26-106)."""
    from anqs_quantum_chemistry_tpu.chem.basis import Shell
    from anqs_quantum_chemistry_tpu.chem.integrals import (
        compute_integrals_ao,
    )

    atoms = [("O", (0.0, 0.0, 0.0))]
    sh = [Shell((0.0, 0.0, 0.0), 2, (0.8,), (1.0,), 0, pure=True)]
    s = compute_integrals_ao(atoms, sh)["S"]
    assert s.shape == (5, 5)
    off = s - np.diag(np.diag(s))
    np.testing.assert_allclose(off, 0.0, atol=1e-12)
    d = np.diag(s)
    np.testing.assert_allclose(
        d / d[0], [1.0, 1.0, 3.0, 1.0, 3.0], rtol=1e-10
    )


def test_cr_sv_basis_structure():
    """The embedded Cr SV basis reproduces the reference's
    (14s,8p,5d) -> [5s,2p,2d] spherical contraction: 21 AOs, and the
    cached Cr atom ROHF (multiplicity 7, 3d^5 4s^1) sits in the expected
    window just above the known ROHF limit (-1043.356 Ha)."""
    import os

    from anqs_quantum_chemistry_tpu.chem.basis import basis_for_atoms
    from anqs_quantum_chemistry_tpu.chem.geometry_repo import (
        GEOMETRIES, geometry_bohr,
    )

    shells = basis_for_atoms(geometry_bohr(GEOMETRIES["Cr"]), "sv")
    assert len(shells) == 9
    assert sum(s.n_final for s in shells) == 21
    assert [s.angmom for s in shells] == [0] * 5 + [1] * 2 + [2] * 2
    assert all(s.pure for s in shells if s.angmom == 2)

    # The full Cr/SV ROHF runs ~2.5 min (integral build); assert from the
    # committed molecule cache rather than rebuilding in-suite.
    import glob

    import numpy as np_

    caches = glob.glob("mols/Cr/*.npz")
    if caches:
        d = np_.load(caches[0], allow_pickle=True)
        e = float(d["hf_energy"])
        assert -1043.36 < e < -1042.5, e
        assert int(d["n_alpha"]) - int(d["n_beta"]) == 6


def test_third_row_sto3g_atoms():
    # Na-Ar STO-3G is derived in-tree (tools/fit_sto3g.py: universal 3sp
    # expansion + variational best-atom zetas). Regression against the
    # recorded fit-time energies; virial -V/T == 2 at the variational
    # optimum is the literature-free correctness check.
    for el, ne, e_ref in [
        ("Mg", 12, -197.193647),
        ("Ar", 18, -521.264922),
    ]:
        atoms = [(el, (0.0, 0.0, 0.0))]
        shells = basis_for_atoms(atoms, "sto-3g")
        assert len(shells) == 5  # 1s + 2s/2p + 3s/3p
        ints = compute_integrals_ao(atoms, shells)
        res = rhf(ints["S"], ints["T"] + ints["V"], ints["ERI"], ne, 0.0)
        assert res["converged"]
        assert abs(res["hf_energy"] - e_ref) < 2e-4, el
        t_e = float(np.sum(res["density"] * ints["T"]))
        virial = -(res["hf_energy"] - t_e) / t_e
        assert abs(virial - 2.0) < 2e-4, el


def test_third_row_sto3g_open_shell():
    from anqs_quantum_chemistry_tpu.chem.scf import rohf

    atoms = [("Na", (0.0, 0.0, 0.0))]
    shells = basis_for_atoms(atoms, "sto-3g")
    ints = compute_integrals_ao(atoms, shells)
    res = rohf(ints["S"], ints["T"] + ints["V"], ints["ERI"], 6, 5, 0.0)
    assert res["converged"]
    assert abs(res["hf_energy"] - (-159.810319)) < 2e-4
