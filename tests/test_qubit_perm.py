"""Qubit-permutation wiring: physics is invariant under qubit relabeling
(reference HilbertSpace perm/inv_perm, hilbert_space.py:97-104,230-237)."""

import numpy as np
import jax
import jax.numpy as jnp

from anqs_quantum_chemistry_tpu.chem import fci as fci_mod
from anqs_quantum_chemistry_tpu.chem.jw import (
    permute_det,
    permute_qubits_hamiltonian,
)
from anqs_quantum_chemistry_tpu.chem.molecule import Molecule, MolConfig
from anqs_quantum_chemistry_tpu.experiments.preparation import create_masker
from anqs_quantum_chemistry_tpu.observables.pauli import PauliEngine
from anqs_quantum_chemistry_tpu.ops import bits as bitops, keys


def test_permuted_hamiltonian_matrix_elements():
    """<y|H|x> is preserved under consistent relabeling of x, y, H."""
    mol = Molecule.create(MolConfig(name="LiH"), mols_dir="mols")
    n = mol.qubit_num
    rng = np.random.default_rng(7)
    perm = rng.permutation(n)
    ham_p = permute_qubits_hamiltonian(mol.qubit_ham, perm)
    assert ham_p.n_terms == mol.qubit_ham.n_terms
    assert ham_p.n_groups == mol.qubit_ham.n_groups

    dets = fci_mod.sector_determinants(n, 2, 2)
    sel = rng.choice(len(dets), size=12, replace=False)
    for i in sel[:6]:
        for j in sel[6:]:
            x, y = int(dets[i]), int(dets[j])
            orig = mol.qubit_ham.dense_matrix_element(x, y)
            perm_me = ham_p.dense_matrix_element(
                permute_det(x, perm), permute_det(y, perm)
            )
            np.testing.assert_allclose(perm_me, orig, atol=1e-12)


def test_permuted_local_energy_and_masker():
    """E_loc over the full sector is row-for-row invariant, and the
    permuted masker accepts exactly the permuted physical states."""
    mol = Molecule.create(MolConfig(name="LiH"), mols_dir="mols")
    n = mol.qubit_num
    rng = np.random.default_rng(3)
    perm = rng.permutation(n)

    dets = np.asarray(fci_mod.sector_determinants(n, 2, 2), dtype=np.uint64)
    dets_p = np.zeros_like(dets)
    for i, p in enumerate(perm):
        dets_p |= ((dets >> np.uint64(p)) & np.uint64(1)) << np.uint64(i)

    la = np.asarray(-np.abs(rng.standard_normal(len(dets))), np.float32)
    ph = np.asarray(rng.standard_normal(len(dets)), np.float32)

    def eloc(ham, det_vals, la_, ph_):
        bits = (
            (det_vals[:, None] >> np.arange(n, dtype=np.uint64)[None, :])
            & np.uint64(1)
        ).astype(np.int64)
        words = bitops.pack(jnp.asarray(bits))
        sw, _, la_s, ph_s = keys.sort_words(
            words, jnp.asarray(la_), jnp.asarray(ph_)
        )
        valid = jnp.ones(len(det_vals), bool)
        e = PauliEngine(ham).local_energy_proxy(sw, la_s, ph_s, valid)
        order = np.argsort(det_vals, kind="stable")
        # return E_loc re-indexed by original det order
        out = np.empty(len(det_vals))
        out[order] = np.asarray(e.e_re)
        return out

    e_orig = eloc(mol.qubit_ham, dets, la, ph)
    ham_p = permute_qubits_hamiltonian(mol.qubit_ham, perm)
    e_perm = eloc(ham_p, dets_p, la, ph)
    np.testing.assert_allclose(e_perm, e_orig, rtol=2e-4, atol=2e-4)

    # Masker acceptance: permuted masker accepts permuted sector states.
    masker = create_masker(mol, "e_num_spin", perm=perm)
    from anqs_quantum_chemistry_tpu.symmetries import QubitGrouping

    grouping = QubitGrouping.create(masker, qubit_per_qudit=3)
    bits_p = (
        (dets_p[:, None] >> np.arange(n, dtype=np.uint64)[None, :])
        & np.uint64(1)
    ).astype(np.int64)
    accepted = masker.is_physical(bits_p)
    assert np.all(accepted)
    # and rejects a permuted out-of-sector state (wrong Sz)
    bad = int(dets[0]) ^ 0b11  # move an electron alpha->beta
    bad_bits = np.array(
        [[(permute_det(bad, perm) >> i) & 1 for i in range(n)]]
    )
    assert not masker.is_physical(bad_bits)[0]


def test_permuted_vmc_exact_energy():
    """Exact-summation Rayleigh quotient from the same seed descends below
    HF under a permutation too (full stack smoke), and the masker DP gives
    the full sector size."""
    from anqs_quantum_chemistry_tpu.experiments.vmc import VMC, VMCConfig
    from anqs_quantum_chemistry_tpu.models.anqs import AnqsConfig

    mol = Molecule.create(MolConfig(name="H2"), mols_dir="mols")
    rng = np.random.default_rng(11)
    perm = tuple(int(x) for x in rng.permutation(mol.qubit_num))
    vmc = VMC(
        mol,
        VMCConfig(sampling_mode="exact", lr=5e-2, qubit_per_qudit=2,
                  qubit_perm=perm),
        AnqsConfig(hidden_widths=(32,)),
    )
    params, opt_state, key = vmc.init_state()
    step = vmc._get_step()
    e0 = None
    for it in range(150):
        params, opt_state, key, m = step(params, opt_state, key)
        if e0 is None:
            e0 = float(m["energy"])
    e_final = float(m["energy"])
    assert e_final < e0
    assert e_final < mol.hf_energy + 5e-3
    assert e_final > mol.fci_energy - 1e-6
