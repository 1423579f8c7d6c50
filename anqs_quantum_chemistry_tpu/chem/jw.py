"""Jordan-Wigner transform to bit-mask Pauli form (vectorized numpy).

The reference parses an OpenFermion QubitOperator into (weights, xy_masks,
yz_masks) with a ``x i per Y`` weight convention (reference: nqs/nqs/
stochastic/observables/pauli_observable.py:150-211). Here the transform is
done from scratch and lands directly in the **XZ canonical form**: every Pauli
string is written ``w * X^A Z^B`` (Y = i X Z absorbed), which makes all
weights of a real Hamiltonian real and gives the matrix-element rule

    <x ^ A | w X^A Z^B | x> = w * (-1)^popcount(x & B)

with no complex phases anywhere -- the form the TPU local-energy engine
consumes (a binary matmul for the signs; see observables/pauli.py).

``A`` is the determinant-flip mask (the reference's xy mask) and ``B`` is the
sign mask (the reference's yz mask).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np

from ..ops.bits import WORD_BITS, n_words


@dataclasses.dataclass
class PauliHamiltonian:
    """Grouped Pauli-sum Hamiltonian in XZ canonical form.

    Terms are sorted by flip mask A; ``group_starts`` is the CSR layout of
    terms sharing each unique A (the reference's unq_xy grouping,
    pauli_observable.py:110-148).
    """

    qubit_num: int
    constant: float  # identity coefficient + nuclear repulsion
    a_masks: np.ndarray  # (M, W) uint32 sorted flip masks (A == xy);
    #   duplicates allowed: an odd-Y (imaginary-weight) channel is a
    #   SECOND group with the same A and phase_offset pi/2
    b_words: np.ndarray  # (T, W) uint32 sign masks per term (B == yz)
    weights: np.ndarray  # (T,) float64 (real; i^{#Y} signs folded, the
    #   remaining factor i for odd-Y groups lives in phase_offsets)
    group_starts: np.ndarray  # (M+1,) int64 CSR offsets into b_words/weights
    phase_offsets: object = None  # (M,) float or None: per-group phase
    #   of the matrix element <x^A|H_m|x> = e^{i off} sum_b w (-1)^{b.x}.
    #   None == all-real Hamiltonian (every molecular JW case). Odd-Y
    #   Pauli groups carry off = pi/2 (reference carries these as
    #   complex weights, pauli_observable.py:150-183).

    @property
    def n_groups(self) -> int:
        return self.a_masks.shape[0]

    @property
    def n_terms(self) -> int:
        return self.weights.shape[0]

    def dense_matrix_element(self, x_bits: int, y_bits: int):
        """Oracle <y|H|x> for tests (python ints, any qubit count).

        Returns a float for real Hamiltonians, complex when any group
        carries a phase offset (odd-Y terms)."""
        flip = x_bits ^ y_bits
        a_ints = words_to_pyints(self.a_masks)
        b_ints = words_to_pyints(self.b_words)
        cplx = self.phase_offsets is not None
        val = complex(0.0) if cplx else 0.0
        if flip == 0:
            val += self.constant
        m = int(np.searchsorted(a_ints, flip))
        while m < len(a_ints) and a_ints[m] == flip:
            s, e = self.group_starts[m], self.group_starts[m + 1]
            fac = (
                np.exp(1j * float(self.phase_offsets[m])) if cplx else 1.0
            )
            for t in range(s, e):
                par = bin(x_bits & int(b_ints[t])).count("1") % 2
                val += fac * self.weights[t] * (-1.0 if par else 1.0)
            m += 1
        return complex(val) if cplx else float(val)


def ints_to_words(values, qubit_num: int) -> np.ndarray:
    """(N,) ints (python ints allowed, any size) -> (N, W) uint32 words."""
    w = n_words(qubit_num)
    out = np.zeros((len(values), w), dtype=np.uint32)
    mask = (1 << WORD_BITS) - 1
    for i, v in enumerate(values):
        v = int(v)
        for j in range(w):
            out[i, j] = (v >> (WORD_BITS * j)) & mask
    return out


def words_to_pyints(words: np.ndarray) -> list:
    """(N, W) uint32 words -> list of python ints (any qubit count)."""
    out = []
    for row in words:
        v = 0
        for j in range(words.shape[1]):
            v |= int(row[j]) << (WORD_BITS * j)
        out.append(v)
    return out


def words_to_ints(words: np.ndarray) -> np.ndarray:
    """(N, W) uint32 words -> (N,) uint64 (requires <= 64 qubits)."""
    assert words.shape[1] * WORD_BITS <= 64
    out = np.zeros(words.shape[0], dtype=np.uint64)
    for j in range(words.shape[1]):
        out |= words[:, j].astype(np.uint64) << np.uint64(WORD_BITS * j)
    return out


def _expand_ladder_products(
    orbitals: np.ndarray, daggers: np.ndarray, coefs: np.ndarray, w: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """JW-expand ladder products a^(d1)_{o1} ... a^(dk)_{ok}.

    ``orbitals``: (T, k) int, ``daggers``: (k,) bool (same pattern for the
    whole batch), ``coefs``: (T,) float, ``w``: words per mask. Returns
    (A (T*2^k, w), B (T*2^k, w), weights (T*2^k,)) with multi-word uint32
    masks -- no 64-qubit cap (the reference codec handles ~100 qubits via
    int64 words, hilbert_space.py:52-53; here W uint32 words).

    Derivation: a_o = Z_{<o} (X_o + i Y_o)/2 and a+_o the conjugate. In XZ
    form, the X-choice contributes X_o Z_{<o} with factor 1/2 and the Y-choice
    contributes X_o Z_{<=o} with factor -sigma/2 (sigma = +1 annihilation,
    -1 creation), since i * sigma * i = -sigma. Products accumulate
    (-1)^popcount(B & x_new) from commuting X^x past Z^B.
    """
    t_num, k = orbitals.shape
    n_choice = 1 << k
    word_idx = (orbitals // WORD_BITS).astype(np.int64)  # (T, k)
    bit_idx = (orbitals % WORD_BITS).astype(np.uint32)

    # x_words[t, i] = one-hot word mask of orbital (T, k, w)
    j_idx = np.arange(w)
    x_words = np.where(
        j_idx[None, None, :] == word_idx[..., None],
        (np.uint32(1) << bit_idx[..., None].astype(np.uint32)),
        np.uint32(0),
    ).astype(np.uint32)
    # below[t, i] = all bits strictly below the orbital
    full = np.uint32(0xFFFFFFFF)
    below = np.where(
        j_idx[None, None, :] < word_idx[..., None], full, np.uint32(0)
    )
    low = (
        (np.uint32(1) << bit_idx[..., None].astype(np.uint32)) - np.uint32(1)
    )
    below = below | np.where(
        j_idx[None, None, :] == word_idx[..., None], low, np.uint32(0)
    )
    below = below.astype(np.uint32)

    a_acc = np.zeros((t_num, n_choice, w), dtype=np.uint32)
    b_acc = np.zeros((t_num, n_choice, w), dtype=np.uint32)
    w_acc = np.broadcast_to(
        coefs[:, None] / (2.0**k), (t_num, n_choice)
    ).copy()

    choice_bits = (
        (np.arange(n_choice)[None, :] >> np.arange(k)[:, None]) & 1
    ).astype(bool)  # (k, n_choice)

    for i in range(k):
        use_y = choice_bits[i][None, :]  # (1, n_choice)
        x_i = x_words[:, i][:, None, :]  # (T, 1, w)
        z_i = np.where(
            use_y[..., None], below[:, i][:, None, :] | x_i,
            below[:, i][:, None, :],
        )
        sigma = -1.0 if daggers[i] else 1.0
        w_acc = np.where(use_y, -sigma * w_acc, w_acc)
        # Anticommutation: X^{x_i} moves past Z^{b_acc}: sign flips when
        # bit o_i of b_acc is set.
        b_word = np.take_along_axis(
            b_acc, word_idx[:, i][:, None, None], axis=2
        )[..., 0]  # (T, n_choice)
        crosses = ((b_word >> bit_idx[:, i][:, None]) & 1).astype(bool)
        w_acc = np.where(crosses, -w_acc, w_acc)
        a_acc = a_acc ^ x_i
        b_acc = b_acc ^ z_i

    return (
        a_acc.reshape(-1, w),
        b_acc.reshape(-1, w),
        w_acc.ravel(),
    )


def jordan_wigner_pauli_hamiltonian(
    h1: np.ndarray,
    v: np.ndarray,
    constant: float = 0.0,
    tol: float = 1e-12,
) -> PauliHamiltonian:
    """Second-quantized H -> grouped Pauli form.

    H = constant + sum h1[p,q] a+_p a_q
        + 1/2 sum v[p,q,r,s] <pq|rs> a+_p a+_q a_s a_r.
    """
    n_so = h1.shape[0]
    w = n_words(n_so)

    all_a, all_b, all_w = [], [], []

    p_idx, q_idx = np.nonzero(np.abs(h1) > tol)
    if len(p_idx):
        a, b, wt = _expand_ladder_products(
            np.stack([p_idx, q_idx], axis=1),
            np.array([True, False]),
            h1[p_idx, q_idx],
            w,
        )
        all_a.append(a)
        all_b.append(b)
        all_w.append(wt)

    pq = np.nonzero(np.abs(v) > tol)
    if len(pq[0]):
        orbitals = np.stack([pq[0], pq[1], pq[3], pq[2]], axis=1)
        # a+_p a+_q a_s a_r: operator order (p, q, s, r). Expanded in
        # chunks to bound the (T, 16, w) intermediate memory at large n.
        chunk = 200_000
        for s in range(0, len(pq[0]), chunk):
            sl = slice(s, s + chunk)
            a, b, wt = _expand_ladder_products(
                orbitals[sl],
                np.array([True, True, False, False]),
                0.5 * v[pq][sl],
                w,
            )
            all_a.append(a)
            all_b.append(b)
            all_w.append(wt)

    a_all = (
        np.concatenate(all_a) if all_a else np.zeros((0, w), np.uint32)
    )
    b_all = (
        np.concatenate(all_b) if all_b else np.zeros((0, w), np.uint32)
    )
    w_all = np.concatenate(all_w) if all_w else np.zeros(0, np.float64)

    # Merge duplicate (A, B) strings (multi-word row-wise unique).
    pair = np.concatenate([a_all, b_all], axis=1)
    uniq, inverse = np.unique(pair, axis=0, return_inverse=True)
    weights = np.zeros(len(uniq), dtype=np.float64)
    np.add.at(weights, inverse, w_all)

    keep = np.abs(weights) > tol
    uniq = uniq[keep]
    weights = weights[keep]

    # Identity term -> constant.
    is_id = (uniq == 0).all(axis=1)
    const = constant + float(weights[is_id].sum())
    uniq = uniq[~is_id]
    weights = weights[~is_id]

    # Sort by (A, B) canonically (most-significant word first within A,
    # then B) and build the CSR grouping over unique A.
    a_cols = uniq[:, :w]
    b_cols = uniq[:, w:]
    sort_keys = tuple(b_cols[:, j] for j in range(w)) + tuple(
        a_cols[:, j] for j in range(w)
    )
    order = np.lexsort(sort_keys)
    a_sorted = a_cols[order]
    b_sorted = b_cols[order]
    weights = weights[order]
    unique_a, first = np.unique(a_sorted, axis=0, return_index=True)
    first = np.sort(first)
    unique_a = a_sorted[first]
    group_starts = np.concatenate([first, [len(a_sorted)]]).astype(np.int64)

    return PauliHamiltonian(
        qubit_num=n_so,
        constant=const,
        a_masks=np.ascontiguousarray(unique_a),
        b_words=np.ascontiguousarray(b_sorted),
        weights=weights,
        group_starts=group_starts,
    )


def z_string_symmetries(ham: PauliHamiltonian) -> np.ndarray:
    """Z-string symmetry generators: GF(2) nullspace of the flip-mask matrix.

    A Z-string Z^g commutes with every term iff popcount(g & A_m) is even for
    all unique flip masks A_m; the generators are the nullspace over GF(2).
    Replaces the reference's PennyLane RREF/kernel tapering-generator path
    (reference: nqs/nqs/applications/quantum_chemistry/molecule.py:209-234).

    Returns (G, qubit_num) 0/1 int8 rows, one per independent generator.
    """
    n = ham.qubit_num
    rows = _unpack_bits(ham.a_masks, n)
    return _gf2_nullspace(rows)


def _unpack_bits(words: np.ndarray, n: int) -> np.ndarray:
    """(R, W) uint32 packed rows -> (R, n) 0/1 int8 bit matrix."""
    out = np.zeros((words.shape[0], n), dtype=np.int8)
    for j in range(n):
        out[:, j] = (
            words[:, j // WORD_BITS] >> np.uint32(j % WORD_BITS)
        ) & np.uint32(1)
    return out


def _gf2_nullspace(rows: np.ndarray) -> np.ndarray:
    """Nullspace basis of a 0/1 matrix over GF(2): (G, C) int8 rows."""
    n = rows.shape[1]
    m = rows.copy() % 2
    pivots = []
    r = 0
    for c in range(n):
        pivot_rows = np.nonzero(m[r:, c])[0]
        if len(pivot_rows) == 0:
            continue
        pr = r + pivot_rows[0]
        m[[r, pr]] = m[[pr, r]]
        elim = np.nonzero(m[:, c])[0]
        for e in elim:
            if e != r:
                m[e] ^= m[r]
        pivots.append(c)
        r += 1
        if r == m.shape[0]:
            break
    free = [c for c in range(n) if c not in pivots]
    basis = []
    for fc in free:
        g = np.zeros(n, dtype=np.int8)
        g[fc] = 1
        for i, pc in enumerate(pivots):
            if i < r and m[i, fc]:
                g[pc] = 1
        basis.append(g)
    return np.array(basis, dtype=np.int8).reshape(len(basis), n)


def symplectic_symmetries(ham: PauliHamiltonian):
    """Full Pauli symmetry generators: GF(2) kernel of the symplectic form.

    A Pauli string tau with x-vector x_g and z-vector z_g commutes with a
    Hamiltonian term (a_m, b_m) iff a_m . z_g + b_m . x_g = 0 (mod 2), so
    the generator set is the nullspace of the (T, 2n) binary matrix
    [B | A] acting on (x_g; z_g). This is the symplectic-kernel tapering
    of the reference (nqs/nqs/applications/quantum_chemistry/
    molecule.py:209-234, via PennyLane's RREF/_kernel): unlike
    ``z_string_symmetries`` (the x_g = 0 restriction, which is what feeds
    the sampling masker here and in every reference experiment), it also
    emits X/Y-bearing generators.

    Returns (x_bits, z_bits): two (G, qubit_num) 0/1 int8 arrays. A
    generator's qubit j carries I/X/Y/Z for (x, z) = (0,0)/(1,0)/(1,1)/
    (0,1).
    """
    n = ham.qubit_num
    group_id = np.repeat(
        np.arange(ham.n_groups),
        np.diff(ham.group_starts).astype(np.int64),
    )
    a_bits = _unpack_bits(ham.a_masks, n)[group_id]  # per-term A
    b_bits = _unpack_bits(ham.b_words, n)
    kernel = _gf2_nullspace(
        np.concatenate([b_bits, a_bits], axis=1)
    )
    return kernel[:, :n], kernel[:, n:]


def permute_qubits_hamiltonian(
    ham: PauliHamiltonian, perm
) -> PauliHamiltonian:
    """Relabel qubits: new qubit ``i`` carries old qubit ``perm[i]`` (the
    same convention as ``ops.bits.permute_qubits``).

    Counterpart of the reference's HilbertSpace perm/inv_perm hooks
    (reference: nqs/nqs/base/hilbert_space.py:97-104,230-237), which
    support orbital-reordering experiments: the autoregressive
    factorization quality depends on qubit order, the physics does not.
    Flip masks keep their group structure; groups are re-sorted so
    ``a_masks`` stays canonically ordered (dense_matrix_element relies on
    it)."""
    n = ham.qubit_num
    perm = np.asarray(perm, dtype=np.int64)
    assert sorted(perm.tolist()) == list(range(n)), "not a permutation"

    def permute_words(words):
        out_bits = np.zeros((words.shape[0], n), dtype=np.uint64)
        for i in range(n):
            p = int(perm[i])
            out_bits[:, i] = (
                words[:, p // WORD_BITS] >> np.uint32(p % WORD_BITS)
            ) & np.uint32(1)
        out = np.zeros_like(words)
        for i in range(n):
            out[:, i // WORD_BITS] |= (
                out_bits[:, i].astype(np.uint32) << np.uint32(i % WORD_BITS)
            )
        return out

    a_new = permute_words(ham.a_masks)
    b_new = permute_words(ham.b_words)
    a_ints = words_to_pyints(a_new)
    order = sorted(range(len(a_ints)), key=lambda m: a_ints[m])
    starts = ham.group_starts
    new_starts = [0]
    b_parts, w_parts = [], []
    for m in order:
        s, e = int(starts[m]), int(starts[m + 1])
        b_parts.append(b_new[s:e])
        w_parts.append(ham.weights[s:e])
        new_starts.append(new_starts[-1] + (e - s))
    return PauliHamiltonian(
        qubit_num=n,
        constant=ham.constant,
        a_masks=a_new[np.asarray(order)],
        b_words=np.vstack(b_parts),
        weights=np.concatenate(w_parts),
        group_starts=np.asarray(new_starts, dtype=np.int64),
    )


def permute_det(det: int, perm) -> int:
    """Relabel the bits of a determinant: new bit i = old bit perm[i]."""
    return sum(((int(det) >> int(p)) & 1) << i for i, p in enumerate(perm))
