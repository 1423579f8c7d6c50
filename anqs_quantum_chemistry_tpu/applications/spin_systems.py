"""Spin-model Hamiltonians on the same ANQS/VMC stack.

Counterpart of the reference spin-systems application (reference:
nqs/nqs/applications/spin_systems/experiments/stochastic/sandbox.py:1-106,
which wires a transverse-field-Ising QubitOperator through the same masker/
ansatz/observable stack). Here spin Hamiltonians are built directly in the
XZ-canonical bit-mask form the local-energy engine consumes.
"""

from __future__ import annotations

import numpy as np

from ..chem.jw import PauliHamiltonian, ints_to_words


def pauli_sum(qubit_num: int, terms, constant: float = 0.0):
    """terms: iterable of (pauli_string, weight) with pauli_string a dict
    {qubit: 'X'|'Y'|'Z'}. Returns a grouped PauliHamiltonian.

    Y operators are absorbed into XZ form (Y = i X Z, so a term carries
    i^{#Y}): the sign part of i^{#Y} folds into the real weight, and an
    odd-Y term's residual factor i becomes a SEPARATE group with the
    same flip mask and ``phase_offsets`` entry pi/2 -- for any fixed
    (a, b) pair the Y count popcount(a & b) is fixed, so each (a, b) is
    purely real or purely imaginary and the two channels never mix.
    (The reference carries complex weights instead,
    pauli_observable.py:150-183; a real-weight + group-phase split maps
    better onto the MXU sign-matmul pipeline.)
    """
    acc = {}
    const = constant
    for ops, w in terms:
        a = b = 0
        phase_i = 0  # powers of i from Y = i X Z
        for q, p in ops.items():
            if p == "X":
                a |= 1 << q
            elif p == "Z":
                b |= 1 << q
            elif p == "Y":
                a |= 1 << q
                b |= 1 << q
                phase_i += 1
            else:
                raise ValueError(p)
        odd = phase_i % 2
        # i^{#Y} = (+-1) for even #Y, (+-1) * i for odd #Y.
        sign = -1.0 if phase_i % 4 in (2, 3) else 1.0
        w_eff = float(w) * sign
        if a == 0 and b == 0:
            const += w_eff
            continue
        acc[(a, odd, b)] = acc.get((a, odd, b), 0.0) + w_eff

    pairs = sorted(acc.items())
    a_all = np.array([p[0][0] for p in pairs], dtype=np.uint64)
    odd_all = np.array([p[0][1] for p in pairs], dtype=np.int64)
    b_all = np.array([p[0][2] for p in pairs], dtype=np.uint64)
    w_all = np.array([p[1] for p in pairs], dtype=np.float64)
    change = np.ones(len(pairs), dtype=bool)
    change[1:] = (a_all[1:] != a_all[:-1]) | (odd_all[1:] != odd_all[:-1])
    first = np.flatnonzero(change)
    group_starts = np.concatenate([first, [len(a_all)]]).astype(np.int64)
    group_a = a_all[first]
    group_odd = odd_all[first]
    has_imag = bool(group_odd.any())
    return PauliHamiltonian(
        qubit_num=qubit_num,
        constant=const,
        a_masks=ints_to_words(group_a, qubit_num),
        b_words=ints_to_words(b_all, qubit_num),
        weights=w_all,
        group_starts=group_starts,
        phase_offsets=(
            (np.pi / 2.0) * group_odd.astype(np.float64)
            if has_imag else None
        ),
    )


def tfi_hamiltonian(
    qubit_num: int, j: float = 1.0, h: float = 1.0, periodic: bool = False
) -> PauliHamiltonian:
    """Transverse-field Ising chain H = -j sum Z_i Z_{i+1} - h sum X_i."""
    terms = []
    bonds = qubit_num if periodic else qubit_num - 1
    for i in range(bonds):
        terms.append(({i: "Z", (i + 1) % qubit_num: "Z"}, -j))
    for i in range(qubit_num):
        terms.append(({i: "X"}, -h))
    return pauli_sum(qubit_num, terms)


def heisenberg_xxz_hamiltonian(
    qubit_num: int, jxy: float = 1.0, jz: float = 1.0,
    periodic: bool = False,
) -> PauliHamiltonian:
    """XXZ chain: conserves total Sz, so the spin-projection masker applies."""
    terms = []
    bonds = qubit_num if periodic else qubit_num - 1
    for i in range(bonds):
        k = (i + 1) % qubit_num
        terms.append(({i: "X", k: "X"}, jxy))
        terms.append(({i: "Y", k: "Y"}, jxy))
        terms.append(({i: "Z", k: "Z"}, jz))
    return pauli_sum(qubit_num, terms)


def exact_ground_energy(ham: PauliHamiltonian) -> float:
    """Dense exact diagonalization for <= 14 qubits (test oracle)."""
    from ..chem.jw import words_to_ints

    n = ham.qubit_num
    assert n <= 14
    dim = 1 << n
    cplx = ham.phase_offsets is not None
    # dense_matrix_element sums over EVERY group matching the flip mask,
    # so iterate unique flips only (duplicate a_masks carry the odd-Y
    # imaginary channel).
    a_uniq = sorted(set(words_to_ints(ham.a_masks).tolist()))
    mat = np.zeros((dim, dim), dtype=np.complex128 if cplx else np.float64)
    for x in range(dim):
        for a in a_uniq:
            a = int(a)
            mat[x ^ a, x] += ham.dense_matrix_element(x, x ^ a) - (
                ham.constant if a == 0 else 0.0
            )
        mat[x, x] += ham.constant
    return float(np.linalg.eigvalsh(mat)[0])
