"""Multi-word (>64 qubit) Jordan-Wigner masks.

The reference codec handles ~100 qubits via multiple int64 words
(hilbert_space.py:52-53); round 1 capped the JW mask builder at 64. These
tests pin the multi-word build against two independent oracles:

* the Slater-Condon matrix elements from chem/fci.py (python-int dets,
  arbitrary width),
* the single-word build on an embedded small problem.
"""

import numpy as np

from anqs_quantum_chemistry_tpu.chem import fci as fci_mod
from anqs_quantum_chemistry_tpu.chem.jw import (
    jordan_wigner_pauli_hamiltonian,
)


def random_integrals(n_so, n_active, rng, seed_orbitals=None):
    """Random hermitian h1 / antisymmetry-free v supported on a subset of
    spin-orbitals (possibly spanning several 32-bit words)."""
    act = (
        np.asarray(seed_orbitals)
        if seed_orbitals is not None
        else rng.choice(n_so, size=n_active, replace=False)
    )
    h1 = np.zeros((n_so, n_so))
    sub = rng.standard_normal((n_active, n_active))
    h1[np.ix_(act, act)] = sub + sub.T
    v = np.zeros((n_so, n_so, n_so, n_so))
    sub4 = rng.standard_normal((n_active,) * 4)
    # <pq|rs> symmetry: v[p,q,r,s] = v[q,p,s,r] (hermitian real integrals)
    sub4 = sub4 + sub4.transpose(1, 0, 3, 2)
    v[np.ix_(act, act, act, act)] = sub4
    return h1, v, act


def check_vs_slater_condon(n_so, act, h1, v, rng, n_pairs=60):
    ham = jordan_wigner_pauli_hamiltonian(h1, v, constant=0.0)
    assert ham.qubit_num == n_so
    # Random occupation of the active orbitals, fixed electron count.
    n_elec = max(2, len(act) // 2)
    for _ in range(n_pairs):
        occ_x = rng.choice(act, size=n_elec, replace=False)
        x = sum(1 << int(o) for o in occ_x)
        kind = rng.integers(3)
        if kind == 0:
            y = x
        elif kind == 1:  # single excitation within active space
            occ = list(occ_x)
            virt = [o for o in act if o not in occ]
            y = x ^ (1 << int(rng.choice(occ))) ^ (1 << int(rng.choice(virt)))
        else:  # double excitation
            occ = list(rng.choice(occ_x, size=2, replace=False))
            virt = [o for o in act if o not in occ_x]
            vv = list(rng.choice(virt, size=2, replace=False))
            y = x ^ sum(1 << int(o) for o in occ) ^ sum(
                1 << int(o) for o in vv
            )
        expected = fci_mod.matrix_element(int(y), int(x), h1, v)
        got = ham.dense_matrix_element(int(x), int(y))
        np.testing.assert_allclose(got, expected, atol=1e-10)


def test_jw_single_word_vs_slater_condon(rng):
    h1, v, act = random_integrals(10, 6, rng)
    check_vs_slater_condon(10, act, h1, v, rng)


def test_jw_multiword_vs_slater_condon(rng):
    """70 qubits (3 words), active orbitals spanning all word boundaries."""
    act = np.array([0, 1, 30, 31, 32, 33, 63, 64, 68, 69])
    h1, v, act = random_integrals(70, len(act), rng, seed_orbitals=act)
    check_vs_slater_condon(70, act, h1, v, rng, n_pairs=40)


def test_jw_multiword_embedding_matches_single_word(rng):
    """The same physical problem embedded at 40 qubits (2 words) produces
    identical masks (word 0) and weights as the 12-qubit build."""
    h1s, vs, act = random_integrals(12, 6, rng, seed_orbitals=range(6))
    ham_small = jordan_wigner_pauli_hamiltonian(h1s, vs)
    h1l = np.zeros((40, 40))
    h1l[:12, :12] = h1s
    vl = np.zeros((40, 40, 40, 40))
    vl[:12, :12, :12, :12] = vs
    ham_large = jordan_wigner_pauli_hamiltonian(h1l, vl)
    assert ham_large.a_masks.shape[1] == 2
    np.testing.assert_array_equal(
        ham_large.a_masks[:, 0], ham_small.a_masks[:, 0]
    )
    assert (ham_large.a_masks[:, 1] == 0).all()
    np.testing.assert_array_equal(
        ham_large.b_words[:, 0], ham_small.b_words[:, 0]
    )
    np.testing.assert_allclose(ham_large.weights, ham_small.weights)
    np.testing.assert_array_equal(
        ham_large.group_starts, ham_small.group_starts
    )
