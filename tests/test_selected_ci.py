"""Selected CI (chem/selected_ci.py): support expansion + restricted
diagonalization converge to FCI from a single-determinant seed."""

import numpy as np

from anqs_quantum_chemistry_tpu.chem.molecule import Molecule, MolConfig
from anqs_quantum_chemistry_tpu.chem import selected_ci as sci


def _mol(name):
    return Molecule.create(
        MolConfig(name=name), mols_dir="mols", run_fci=True, run_cisd=True
    )


def test_restricted_ground_state_is_cisd_on_cisd_support():
    mol = _mol("LiH")
    from anqs_quantum_chemistry_tpu.chem import fci as fci_mod

    hf = int(np.asarray(mol.hf_det).ravel()[0])
    dets = sorted(
        set([hf] + fci_mod._excitations_in_sector(hf, mol.qubit_num))
    )
    e, c = sci.restricted_ground_state(dets, mol.h1, mol.v, mol.e_nuc)
    np.testing.assert_allclose(e, mol.cisd_energy, atol=1e-8)
    assert abs(np.linalg.norm(c) - 1.0) < 1e-8


def test_selected_ci_reaches_fci_from_hf_seed():
    mol = _mol("LiH")
    hf = int(np.asarray(mol.hf_det).ravel()[0])
    rows = []
    e, dets, coef = sci.selected_ci(
        [hf], mol.h1, mol.v, mol.e_nuc,
        n_parents=64, rounds=4, tol=1e-9,
        on_round=rows.append,
    )
    # LiH FCI space is tiny; two expansions (HF -> CISD -> CISDTQ) must
    # hit FCI to numerical accuracy, monotonically.
    assert e <= mol.cisd_energy + 1e-10
    np.testing.assert_allclose(e, mol.fci_energy, atol=1e-7)
    energies = [r["energy"] for r in rows]
    assert all(b <= a + 1e-12 for a, b in zip(energies, energies[1:]))


def test_truncate_by_weight_keeps_top_amplitudes():
    mol = _mol("LiH")
    hf = int(np.asarray(mol.hf_det).ravel()[0])
    e, dets, coef = sci.selected_ci(
        [hf], mol.h1, mol.v, mol.e_nuc, n_parents=64, rounds=3
    )
    k = 40
    td, tc = sci.truncate_by_weight(dets, coef, k)
    assert len(td) == k and td == sorted(td)
    np.testing.assert_allclose(np.linalg.norm(tc), 1.0, atol=1e-12)
    # The kept mass equals the top-k |coef|^2 mass of the full vector.
    full = np.sort(np.abs(coef))[::-1]
    kept = np.sum(full[:k] ** 2)
    # Energy of the truncated vector on its own support stays variational
    # and close to the full selected-CI energy.
    e_t, _ = sci.restricted_ground_state(td, mol.h1, mol.v, mol.e_nuc)
    assert mol.fci_energy - 1e-9 <= e_t <= e + (1.0 - kept) * 10 + 2e-3


def test_expand_support_max_new_cap():
    mol = _mol("LiH")
    hf = int(np.asarray(mol.hf_det).ravel()[0])
    out = sci.expand_support([hf], np.ones(1), mol.qubit_num, 1, max_new=7)
    assert len(out) == 8 and hf in out


def test_heatbath_eps0_matches_unscreened():
    mol = _mol("LiH")
    hf = int(np.asarray(mol.hf_det).ravel()[0])
    table = sci.HeatBathTable(mol.h1, mol.v)
    hb = sci.expand_support_heatbath(
        [hf], np.ones(1), table, eps=0.0, n_parents=1
    )
    ref = sci.expand_support([hf], np.ones(1), mol.qubit_num, 1)
    # eps=0 heat-bath = all singles + all NONZERO-|v| doubles: a subset
    # of the unscreened S+D that must preserve the restricted energy
    # (zero-element doubles cannot enter the CI ground state at first
    # order -- on LiH they are also numerically irrelevant).
    assert set(hb) <= set(ref)
    e_hb, _ = sci.restricted_ground_state(hb, mol.h1, mol.v, mol.e_nuc)
    e_ref, _ = sci.restricted_ground_state(ref, mol.h1, mol.v, mol.e_nuc)
    assert abs(e_hb - e_ref) < 5e-7


def test_heatbath_screening_monotone():
    mol = _mol("LiH")
    hf = int(np.asarray(mol.hf_det).ravel()[0])
    table = sci.HeatBathTable(mol.h1, mol.v)
    sizes = []
    energies = []
    for eps in (3e-2, 3e-3, 0.0):
        s = sci.expand_support_heatbath(
            [hf], np.ones(1), table, eps=eps, n_parents=1
        )
        e, _ = sci.restricted_ground_state(s, mol.h1, mol.v, mol.e_nuc)
        sizes.append(len(s))
        energies.append(e)
    assert sizes[0] < sizes[1] <= sizes[2]
    assert energies[0] >= energies[1] >= energies[2] - 1e-12
    # The eps=0 energy is CISD up to zero-element doubles.
    assert abs(energies[2] - mol.cisd_energy) < 5e-7
