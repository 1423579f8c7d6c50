"""Cross-validate found-pairs ACCOUNTING against the reference engine.

VERDICT r3 item 7(b): the bench's 10x headline divides by an estimated
reference throughput; the one thing that can be grounded without the
reference's GPU is the *accounting* -- that our ``found_pairs`` counts
the same thing as the reference's ``sampled_x_primes_num``
(reference pauli_observable.py:446-447), and that the two engines agree
on every local energy for the same state.

This drives the REFERENCE CODE UNMODIFIED (CPU torch) on the LiH/STO-3G
JW Hamiltonian with shims for its unavailable imports:
  - openfermion: only ``QubitOperator.terms`` and ``count_qubits`` are
    touched by the parse path (pauli_observable.py:150-183);
  - nqs.utils.custom_popcount: module import creates a CUDA stream;
    popcount_mode='memory_efficient' (the SWAR path) never calls it.

Protocol: the full 225-det LiH sector with a seeded random complex
state, reference ``compute_var_local_energy_proxy`` (coupling='ham')
vs our ``PauliEngine.local_energy_proxy``. Writes
runs/baseline_accounting.json.
"""

import json
import os
import sys
import types

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np


def install_shims():
    fake_of = types.ModuleType("openfermion")

    class QubitOperator:
        def __init__(self, terms=None):
            self.terms = dict(terms or {})

    def count_qubits(op):
        n = 0
        for ops in op.terms:
            for q, _ in ops:
                n = max(n, q + 1)
        return n

    fake_of.QubitOperator = QubitOperator
    fake_utils = types.ModuleType("openfermion.utils")
    fake_utils.count_qubits = count_qubits
    fake_of.utils = fake_utils
    sys.modules["openfermion"] = fake_of
    sys.modules["openfermion.utils"] = fake_utils

    fake_pc = types.ModuleType("nqs.utils.custom_popcount")

    def _no_cuda(*a, **k):
        raise RuntimeError("CUDA popcount unavailable on CPU")

    fake_pc.cuda_int64_popcount = _no_cuda
    fake_pc.cuda_int64_popcount_ = _no_cuda
    sys.modules["nqs.utils.custom_popcount"] = fake_pc
    return QubitOperator


def our_ham_to_of_terms(ham):
    """XZ-canonical (a, b, w) -> OpenFermion-style terms dict. Inverse of
    the reference parse (x i per Y): w_of * i^{#Y} = w_ours (real,
    molecular case), so w_of = w_ours * (-1)^{(#Y mod 4) == 2}."""
    from anqs_quantum_chemistry_tpu.chem.jw import words_to_pyints

    a_ints = words_to_pyints(ham.a_masks)
    b_ints = words_to_pyints(ham.b_words)
    terms = {(): complex(ham.constant)}
    for m in range(ham.n_groups):
        a = int(a_ints[m])
        for t in range(int(ham.group_starts[m]), int(ham.group_starts[m + 1])):
            b = int(b_ints[t])
            ops = []
            n_y = 0
            q = 0
            ab = a | b
            while (1 << q) <= ab:
                xa = (a >> q) & 1
                zb = (b >> q) & 1
                if xa and zb:
                    ops.append((q, "Y"))
                    n_y += 1
                elif xa:
                    ops.append((q, "X"))
                elif zb:
                    ops.append((q, "Z"))
                q += 1
            w = float(ham.weights[t])
            if n_y % 2:
                raise ValueError("molecular JW terms must be even-Y")
            w_of = complex(w * (-1.0 if n_y % 4 == 2 else 1.0))
            key = tuple(ops)
            terms[key] = terms.get(key, 0j) + w_of
    return terms


def main():
    QubitOperator = install_shims()
    sys.path.insert(0, "/root/reference/nqs")

    import torch as pt

    from nqs.base.hilbert_space import HilbertSpace
    from nqs.stochastic.observables.pauli_observable import (
        PauliObservable,
    )

    from anqs_quantum_chemistry_tpu.chem import fci as fci_mod
    from anqs_quantum_chemistry_tpu.chem.molecule import Molecule, MolConfig

    mol = Molecule.create(
        MolConfig(name="LiH"), mols_dir="mols", run_fci=False,
        run_cisd=False,
    )
    n = mol.qubit_num
    terms = our_ham_to_of_terms(mol.qubit_ham)
    op = QubitOperator(terms)

    import tempfile

    cache_dir = tempfile.mkdtemp(prefix="ref_ham_")
    hs = HilbertSpace(
        qubit_num=n, device=pt.device("cpu"), parent_dir=cache_dir,
        rng_seed=0, popcount_mode="memory_efficient",
    )
    ref_ham = PauliObservable(hilbert_space=hs, of_qubit_operator=op)

    # ---- Determine the reference's vec<->qubit orientation empirically:
    # X_0 must flip OUR qubit 0. Separate HilbertSpace: PauliObservable
    # caches its structure tensors in parent_dir, and a shared dir would
    # make the probe LOAD ref_ham's cache.
    hs_probe = HilbertSpace(
        qubit_num=n, device=pt.device("cpu"),
        parent_dir=tempfile.mkdtemp(prefix="ref_probe_"),
        rng_seed=0, popcount_mode="memory_efficient",
    )
    probe = PauliObservable(
        hilbert_space=hs_probe,
        of_qubit_operator=QubitOperator(
            # zero-weight Z on the top qubit so count_qubits == n
            {((0, "X"),): 1.0, ((n - 1, "Z"),): 0.0}
        ),
    )
    xy_ints = [int(x) for x in probe.unq_xy_masks[:, 0]]
    xy_int = next(x for x in xy_ints if x != 0)

    def det_to_vec(d, reverse):
        bits = [(d >> i) & 1 for i in range(n)]
        return bits[::-1] if reverse else bits

    reverse = None
    for rev in (False, True):
        vec = pt.tensor(
            [det_to_vec(0, rev)], dtype=hs.idx_dtype, device=hs.device
        )
        idx = hs.base_vec2base_idx(vec)
        flipped = hs.base_idx2base_vec(idx ^ xy_int)
        got = [int(x) for x in flipped[0]]
        want = det_to_vec(1, rev)  # qubit 0 set
        if got == want:
            reverse = rev
            break
    assert reverse is not None, "could not determine vec orientation"

    # ---- Shared physical state: the full (2, 2) sector, seeded random
    # complex amplitudes keyed by the determinant integer.
    dets = fci_mod.sector_determinants(n, mol.n_alpha, mol.n_beta)
    rng = np.random.default_rng(11)
    amp_re = rng.normal(size=len(dets))
    amp_im = rng.normal(size=len(dets))
    amps = amp_re + 1j * amp_im
    amps /= np.linalg.norm(amps)
    det2amp = {d: amps[i] for i, d in enumerate(dets)}

    vecs = pt.tensor(
        [det_to_vec(d, reverse) for d in dets],
        dtype=hs.idx_dtype, device=hs.device,
    )
    idxs = hs.base_vec2base_idx(vecs)
    sorted_idxs, _ = hs.sort_base_idx(idxs)
    back = hs.base_idx2base_vec(sorted_idxs)
    sorted_dets = []
    for row in back:
        bits = [int(x) for x in row]
        if reverse:
            bits = bits[::-1]
        sorted_dets.append(sum(b << i for i, b in enumerate(bits)))
    ref_amps = pt.tensor(
        [det2amp[d] for d in sorted_dets], dtype=pt.cdouble
    )

    e_ref, _, metrics = ref_ham.compute_var_local_energy_proxy(
        unq_batch_as_base_indices=sorted_idxs,
        unq_batch_as_amps=ref_amps,
        coupling_method="ham",
        alpha_num=mol.n_alpha,
        beta_num=mol.n_beta,
    )
    ref_found = int(metrics.sampled_x_primes_num)
    e_ref = e_ref.numpy()

    # ---- Ours on the identical state.
    import jax.numpy as jnp

    from anqs_quantum_chemistry_tpu.observables import PauliEngine
    from anqs_quantum_chemistry_tpu.ops import bits as bitops
    from anqs_quantum_chemistry_tpu.ops import keys

    bits = np.array([[(d >> i) & 1 for i in range(n)] for d in dets])
    words = bitops.pack(jnp.asarray(bits))
    sw, _ = keys.sort_words(words)
    sbits = np.asarray(bitops.unpack(sw, n))
    our_sorted_dets = [
        int(sum(int(bb) << i for i, bb in enumerate(r))) for r in sbits
    ]
    a = np.array([det2amp[d] for d in our_sorted_dets])
    la = jnp.asarray(np.log(np.abs(a)), jnp.float32)
    ph = jnp.asarray(np.angle(a), jnp.float32)
    eng = PauliEngine(mol.qubit_ham, membership="search")
    e_ours = eng.local_energy_proxy(
        sw, la, ph, jnp.ones((len(dets),), bool)
    )
    ours_found = int(e_ours.found_pairs)

    ref_by_det = {d: e_ref[i] for i, d in enumerate(sorted_dets)}
    ours_re = np.asarray(e_ours.e_re, np.float64)
    ours_im = np.asarray(e_ours.e_im, np.float64)
    max_diff = 0.0
    for i, d in enumerate(our_sorted_dets):
        r = ref_by_det[d]
        max_diff = max(
            max_diff,
            abs(ours_re[i] - r.real),
            abs(ours_im[i] - r.imag),
        )

    out = {
        "molecule": "LiH/STO-3G JW",
        "sample_set": f"full ({mol.n_alpha},{mol.n_beta}) sector, "
                      f"{len(dets)} dets, seeded random complex state",
        "reference_sampled_x_primes_num": ref_found,
        "ours_found_pairs": ours_found,
        "accounting_match": ref_found == ours_found,
        "max_abs_e_loc_diff": max_diff,
        "reference_coupling_method": "ham",
        "ours_membership": "search",
    }
    print(json.dumps(out, indent=1))
    os.makedirs("runs", exist_ok=True)
    with open("runs/baseline_accounting.json", "w") as f:
        json.dump(out, f, indent=1)
    assert out["accounting_match"], (ref_found, ours_found)
    assert max_diff < 5e-5, max_diff


if __name__ == "__main__":
    main()
