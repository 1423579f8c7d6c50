"""Determinant-space FCI / CISD / MP2 via Slater-Condon rules (numpy/scipy).

Standalone replacement for the reference's post-HF baselines, which it gets
from PySCF/OpenFermion (reference: nqs/nqs/applications/quantum_chemistry/
run_pyscf.py:228-308 and molecular_data.py:83-89 ``run_bf_fci``). Also provides
the exact-diagonalization oracle used by the test suite.

Determinants are Python ints: bit p set = spin-orbital p occupied (interleaved
alpha/beta: even bits alpha, odd bits beta). The Hamiltonian is
  H = sum h1[p,q] a+_p a_q + 1/2 sum v[p,q,r,s] a+_p a+_q a_s a_r
with ``v[p,q,r,s] = <pq|rs>`` (physicist notation), as produced by
``scf.spin_orbital_integrals``.
"""

from __future__ import annotations

import itertools
from typing import Dict, List, Sequence, Tuple

import numpy as np
import scipy.sparse
import scipy.sparse.linalg


def sector_determinants(n_so: int, n_alpha: int, n_beta: int) -> List[int]:
    """All determinants with the given alpha/beta electron counts, sorted."""
    alphas = [
        sum(1 << (2 * o) for o in occ)
        for occ in itertools.combinations(range(n_so // 2), n_alpha)
    ]
    betas = [
        sum(1 << (2 * o + 1) for o in occ)
        for occ in itertools.combinations(range(n_so // 2), n_beta)
    ]
    return sorted(a | b for a in alphas for b in betas)


def _occ_list(det: int, n_so: int) -> List[int]:
    return [p for p in range(n_so) if (det >> p) & 1]


def _parity_between(det: int, p: int, q: int) -> int:
    """(-1)^(number of occupied orbitals strictly between p and q)."""
    lo, hi = (p, q) if p < q else (q, p)
    mask = ((1 << hi) - 1) & ~((1 << (lo + 1)) - 1)
    return -1 if bin(det & mask).count("1") % 2 else 1


def _double_parity(det: int, i: int, j: int, a: int, b: int) -> int:
    """Sign of <D'| a+_a a+_b a_j a_i |D> (apply a_i, a_j, a+_b, a+_a)."""
    sign = 1
    d = det
    for o in (i, j):
        below = bin(d & ((1 << o) - 1)).count("1")
        sign *= -1 if below % 2 else 1
        d &= ~(1 << o)
    for o in (b, a):
        below = bin(d & ((1 << o) - 1)).count("1")
        sign *= -1 if below % 2 else 1
        d |= 1 << o
    return sign


def diagonal_energy(det: int, h1: np.ndarray, v: np.ndarray) -> float:
    occ = _occ_list(det, h1.shape[0])
    e = sum(h1[p, p] for p in occ)
    for p in occ:
        for q in occ:
            if p != q:
                e += 0.5 * (v[p, q, p, q] - v[p, q, q, p])
    return float(e)


def matrix_element(
    det_a: int, det_b: int, h1: np.ndarray, v: np.ndarray
) -> float:
    """<det_a | H | det_b> via Slater-Condon."""
    diff = det_a ^ det_b
    n_diff = bin(diff).count("1")
    if n_diff == 0:
        return diagonal_energy(det_b, h1, v)
    if n_diff == 2:
        p = (diff & det_b).bit_length() - 1  # occupied in b only
        q = (diff & det_a).bit_length() - 1  # occupied in a only
        sign = _parity_between(det_b, p, q)
        common = _occ_list(det_b & det_a, h1.shape[0])
        val = h1[q, p]
        for r in common:
            val += v[q, r, p, r] - v[q, r, r, p]
        return float(sign * val)
    if n_diff == 4:
        rem = diff & det_b
        add = diff & det_a
        i = rem.bit_length() - 1
        rem &= ~(1 << i)
        j = rem.bit_length() - 1
        a = add.bit_length() - 1
        add &= ~(1 << a)
        b = add.bit_length() - 1
        # i > j, a > b as extracted; element is order-insensitive given the
        # simulated parity.
        sign = _double_parity(det_b, j, i, b, a)
        return float(sign * (v[b, a, j, i] - v[b, a, i, j]))
    return 0.0


def _excitations_in_sector(det: int, n_so: int) -> List[int]:
    """All single+double excitations of ``det`` preserving alpha/beta counts."""
    occ = _occ_list(det, n_so)
    virt = [p for p in range(n_so) if not (det >> p) & 1]
    out = []
    occ_by_spin = {0: [p for p in occ if p % 2 == 0],
                   1: [p for p in occ if p % 2 == 1]}
    virt_by_spin = {0: [p for p in virt if p % 2 == 0],
                    1: [p for p in virt if p % 2 == 1]}
    # Singles.
    for s in (0, 1):
        for p in occ_by_spin[s]:
            for q in virt_by_spin[s]:
                out.append(det ^ (1 << p) | (1 << q))
    # Doubles.
    for s1 in (0, 1):
        for s2 in (0, 1):
            if s2 < s1:
                continue
            if s1 == s2:
                pairs_occ = list(
                    itertools.combinations(occ_by_spin[s1], 2)
                )
                pairs_virt = list(
                    itertools.combinations(virt_by_spin[s1], 2)
                )
            else:
                pairs_occ = [
                    (p1, p2)
                    for p1 in occ_by_spin[s1]
                    for p2 in occ_by_spin[s2]
                ]
                pairs_virt = [
                    (q1, q2)
                    for q1 in virt_by_spin[s1]
                    for q2 in virt_by_spin[s2]
                ]
            for p1, p2 in pairs_occ:
                base = det ^ (1 << p1) ^ (1 << p2)
                for q1, q2 in pairs_virt:
                    out.append(base | (1 << q1) | (1 << q2))
    return out


def sparse_hamiltonian(
    dets: Sequence[int],
    h1: np.ndarray,
    v: np.ndarray,
    use_native: bool = True,
) -> scipy.sparse.csr_matrix:
    """Sparse H over an arbitrary determinant basis (rows = dets).

    Uses the C++ builder (chem/native.py, ~100x) when the determinant list is
    sorted and a toolchain is available; the pure-Python path below is the
    readable oracle and the fallback.
    """
    n_so = h1.shape[0]
    dets_list = list(dets)
    is_sorted = all(
        dets_list[i] < dets_list[i + 1] for i in range(len(dets_list) - 1)
    )
    if use_native and is_sorted and len(dets_list) > 512:
        from .native import sparse_hamiltonian_native

        coo = sparse_hamiltonian_native(np.asarray(dets_list, np.uint64),
                                        h1, v)
        if coo is not None:
            rows, cols, vals = coo
            n = len(dets_list)
            return scipy.sparse.csr_matrix(
                (vals, (rows, cols)), shape=(n, n)
            )
    index: Dict[int, int] = {d: i for i, d in enumerate(dets)}
    rows, cols, vals = [], [], []
    for i, det in enumerate(dets):
        rows.append(i)
        cols.append(i)
        vals.append(diagonal_energy(det, h1, v))
        for other in _excitations_in_sector(det, n_so):
            j = index.get(other)
            if j is None or j <= i:
                continue
            el = matrix_element(other, det, h1, v)
            if el != 0.0:
                rows.append(i)
                cols.append(j)
                vals.append(el)
                rows.append(j)
                cols.append(i)
                vals.append(el)
    n = len(dets)
    return scipy.sparse.csr_matrix(
        (vals, (rows, cols)), shape=(n, n)
    )


def _ground_state(h_sparse, e_nuc):
    if h_sparse.shape[0] == 1:
        return float(h_sparse[0, 0]) + e_nuc, np.ones(1)
    if h_sparse.shape[0] <= 256:
        w, u = np.linalg.eigh(h_sparse.toarray())
        return float(w[0]) + e_nuc, u[:, 0]
    w, u = scipy.sparse.linalg.eigsh(h_sparse, k=1, which="SA")
    return float(w[0]) + e_nuc, u[:, 0]


def fci_ground_state(
    h1: np.ndarray,
    v: np.ndarray,
    n_alpha: int,
    n_beta: int,
    e_nuc: float = 0.0,
):
    """In-sector FCI: returns (energy, dets, coefficients, ipr).

    ipr = sum c^4, the wave-function inverse participation ratio the
    reference records as a peakedness measure (run_pyscf.py:304).
    """
    n_so = h1.shape[0]
    dets = sector_determinants(n_so, n_alpha, n_beta)
    h_sp = sparse_hamiltonian(dets, h1, v)
    energy, coef = _ground_state(h_sp, e_nuc)
    ipr = float(np.sum(coef**4))
    return energy, dets, coef, ipr


def cisd_ground_state(
    h1: np.ndarray,
    v: np.ndarray,
    hf_det: int,
    e_nuc: float = 0.0,
):
    """CISD from the given HF determinant: returns (energy, dets, coef)."""
    n_so = h1.shape[0]
    dets = sorted(set([hf_det] + _excitations_in_sector(hf_det, n_so)))
    h_sp = sparse_hamiltonian(dets, h1, v)
    energy, coef = _ground_state(h_sp, e_nuc)
    return energy, dets, coef


def mp2_energy(
    h1: np.ndarray,
    v: np.ndarray,
    mo_energy_so: np.ndarray,
    hf_det: int,
) -> float:
    """MP2 correlation energy (spin-orbital form)."""
    n_so = h1.shape[0]
    occ = _occ_list(hf_det, n_so)
    virt = [p for p in range(n_so) if p not in occ]
    e2 = 0.0
    for i in occ:
        for j in occ:
            for a in virt:
                for b in virt:
                    num = v[a, b, i, j] - v[a, b, j, i]
                    if num == 0.0:
                        continue
                    denom = (
                        mo_energy_so[i]
                        + mo_energy_so[j]
                        - mo_energy_so[a]
                        - mo_energy_so[b]
                    )
                    e2 += 0.25 * num * num / denom
    return float(e2)
