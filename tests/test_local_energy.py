"""Local-energy engine vs exact dense <x|H|psi>/psi(x) oracles (SURVEY.md
section 4 item d)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from anqs_quantum_chemistry_tpu.chem import fci as fci_mod
from anqs_quantum_chemistry_tpu.chem.molecule import Molecule, MolConfig
from anqs_quantum_chemistry_tpu.models import ANQS, AnqsConfig
from anqs_quantum_chemistry_tpu.observables import PauliEngine, mc_estimate
from anqs_quantum_chemistry_tpu.ops import bits as bitops
from anqs_quantum_chemistry_tpu.ops import keys
from anqs_quantum_chemistry_tpu.experiments.preparation import create_masker
from anqs_quantum_chemistry_tpu.symmetries import QubitGrouping


@pytest.fixture(scope="module")
def lih_setup():
    mol = Molecule.create(MolConfig(name="LiH", basis="sto-3g"),
                          mols_dir="mols")
    masker = create_masker(mol, "e_num_spin")
    grouping = QubitGrouping.create(masker, qubit_per_qudit=3)
    anqs = ANQS(grouping, AnqsConfig(hidden_widths=(64,)))
    params = anqs.init(jax.random.PRNGKey(7))
    engine = PauliEngine(mol.qubit_ham)
    dets = fci_mod.sector_determinants(mol.qubit_num, 2, 2)
    bits = np.array(
        [[(d >> i) & 1 for i in range(mol.qubit_num)] for d in dets]
    )
    words = bitops.pack(jnp.asarray(bits))
    return mol, anqs, params, engine, dets, words


def test_matrix_elements_vs_oracle(lih_setup):
    mol, anqs, params, engine, dets, words = lih_setup
    me = np.asarray(engine.matrix_elements(words[:20]))
    from anqs_quantum_chemistry_tpu.chem.jw import words_to_ints

    a_ints = words_to_ints(mol.qubit_ham.a_masks)
    for bi in range(20):
        x = dets[bi]
        for m in [0, 1, len(a_ints) // 2, len(a_ints) - 1]:
            xp = x ^ int(a_ints[m])
            expected = mol.qubit_ham.dense_matrix_element(x, xp)
            if xp == x:
                expected -= mol.qubit_ham.constant
            np.testing.assert_allclose(
                me[bi, m], expected, atol=2e-5,
                err_msg=f"det {bi} group {m}",
            )


def test_local_energy_full_set_is_exact(lih_setup):
    """With every physical det 'sampled', the proxy equals exact E_loc."""
    mol, anqs, params, engine, dets, words = lih_setup
    b = len(dets)
    sorted_words, _ = keys.sort_words(words)
    valid = jnp.ones((b,), bool)
    la, ph = anqs.log_psi(params, sorted_words)
    e = engine.local_energy_proxy(sorted_words, la, ph, valid)

    # Oracle: dense H over the sector; psi from the model.
    h = np.array(
        [
            [mol.qubit_ham.dense_matrix_element(x, y) for x in dets]
            for y in dets
        ]
    )
    la_np = np.asarray(la, np.float64)
    ph_np = np.asarray(ph, np.float64)
    # sorted_words order -> det values
    sorted_bits = np.asarray(bitops.unpack(sorted_words, mol.qubit_num))
    sorted_dets = [
        int(sum(int(bb) << i for i, bb in enumerate(row)))
        for row in sorted_bits
    ]
    det_pos = {d: i for i, d in enumerate(dets)}
    perm = np.array([det_pos[d] for d in sorted_dets])
    psi = np.exp(la_np) * np.exp(1j * ph_np)
    h_perm = h[np.ix_(perm, perm)]
    e_exact = (h_perm @ psi) / psi
    np.testing.assert_allclose(
        np.asarray(e.e_re), e_exact.real, rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(e.e_im), e_exact.imag, rtol=2e-4, atol=2e-4
    )

    # Rayleigh quotient check: weighted mean = <psi|H|psi>/<psi|psi>.
    theor = np.exp(2 * la_np)
    freqs = jnp.asarray(theor / theor.sum(), jnp.float32)
    mean_re, mean_im, _ = mc_estimate(e.e_re, e.e_im, freqs)
    rayleigh = (psi.conj() @ h_perm @ psi).real / (np.abs(psi) ** 2).sum()
    np.testing.assert_allclose(float(mean_re), rayleigh, rtol=1e-4)
    assert abs(float(mean_im)) < 1e-3
    # Variational: above FCI energy.
    assert rayleigh > mol.fci_energy - 1e-9


def test_local_energy_subset_restriction(lih_setup):
    """Proxy over a subset must equal the oracle restricted to the subset,
    including sentinel handling for invalid rows."""
    mol, anqs, params, engine, dets, words = lih_setup
    rng = np.random.default_rng(3)
    sel = np.sort(rng.choice(len(dets), size=64, replace=False))
    sub_words = words[sel]
    b = 80  # capacity 80 with 16 invalid rows
    pad_words = jnp.concatenate(
        [
            sub_words,
            jnp.full((b - 64, sub_words.shape[1]), bitops.UINT(0xFFFFFFFF)),
        ]
    )
    valid = jnp.arange(b) < 64
    sorted_words, _, valid_i = keys.sort_words(
        pad_words, valid.astype(jnp.int32)
    )
    valid = valid_i.astype(bool)
    la, ph = anqs.log_psi(params, sorted_words)
    e = engine.local_energy_proxy(sorted_words, la, ph, valid)

    sub_dets = [dets[i] for i in sel]
    h = np.array(
        [
            [mol.qubit_ham.dense_matrix_element(x, y) for x in sub_dets]
            for y in sub_dets
        ]
    )
    sorted_bits = np.asarray(bitops.unpack(sorted_words, mol.qubit_num))
    la_np = np.asarray(la, np.float64)
    ph_np = np.asarray(ph, np.float64)
    pos = {d: i for i, d in enumerate(sub_dets)}
    v = np.asarray(valid)
    for row in range(b):
        if not v[row]:
            assert np.asarray(e.e_re)[row] == 0.0
            continue
        d = int(
            sum(int(bb) << i for i, bb in enumerate(sorted_bits[row]))
        )
        i = pos[d]
        psi_sub = np.exp(la_np[v]) * np.exp(1j * ph_np[v])
        # map sorted valid rows -> sub_dets order
        order = [
            pos[
                int(
                    sum(
                        int(bb) << k
                        for k, bb in enumerate(sorted_bits[r])
                    )
                )
            ]
            for r in range(b)
            if v[r]
        ]
        h_rows = h[np.ix_(order, order)]
        ridx = order.index(i)
        # local row index of this det among valid sorted rows
        local = [r for r in range(b) if v[r]].index(row)
        e_exact = (h_rows[local] @ psi_sub) / psi_sub[local]
        np.testing.assert_allclose(
            np.asarray(e.e_re)[row], e_exact.real, rtol=3e-4, atol=3e-4
        )
        break  # one row suffices; the full-set test covers the rest


def test_membership_table_matches_search():
    """Direct-address membership (table) and sorted binary search produce
    identical local energies (the two coupling backends; reference keeps
    redundant coupling methods for cross-checking, SURVEY.md section 4.6)."""
    import jax
    import jax.numpy as jnp

    from anqs_quantum_chemistry_tpu.chem.molecule import Molecule, MolConfig
    from anqs_quantum_chemistry_tpu.observables.pauli import PauliEngine
    from anqs_quantum_chemistry_tpu.ops import bits as bitops, keys

    mol = Molecule.create(
        MolConfig(name="H2O"), mols_dir="mols", run_fci=False,
        run_cisd=False,
    )
    rng = np.random.default_rng(7)
    n = mol.qubit_num
    bits = rng.integers(0, 2, size=(64, n))
    words = bitops.pack(jnp.asarray(bits))
    valid = jnp.asarray(rng.random(64) < 0.9)
    words = jnp.where(
        valid[:, None], words, jnp.full_like(words, bitops.UINT(0xFFFFFFFF))
    )
    sw, _, sv = keys.sort_words(words, valid.astype(jnp.int32))
    sv = sv.astype(bool) & keys.unique_mask(sw)
    la = jnp.asarray(rng.standard_normal(64), jnp.float32)
    ph = jnp.asarray(rng.standard_normal(64), jnp.float32)

    e_table = PauliEngine(mol.qubit_ham, membership="table").local_energy_proxy(
        sw, la, ph, sv
    )
    e_search = PauliEngine(
        mol.qubit_ham, membership="search"
    ).local_energy_proxy(sw, la, ph, sv)
    np.testing.assert_allclose(
        np.asarray(e_table.e_re), np.asarray(e_search.e_re), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(e_table.e_im), np.asarray(e_search.e_im), atol=1e-5
    )
    assert int(e_table.found_pairs) == int(e_search.found_pairs)


def test_membership_hash_matches_search():
    """Bucketed-hash membership (any qubit count) == sorted binary search,
    on a 14-qubit molecule (W=1) and a 40-qubit embedding (W=2)."""
    import jax.numpy as jnp

    from anqs_quantum_chemistry_tpu.chem.jw import (
        jordan_wigner_pauli_hamiltonian,
    )
    from anqs_quantum_chemistry_tpu.chem.molecule import Molecule, MolConfig
    from anqs_quantum_chemistry_tpu.observables.pauli import PauliEngine
    from anqs_quantum_chemistry_tpu.ops import bits as bitops, keys

    rng = np.random.default_rng(11)

    def check(ham, n, n_samp=64):
        bits = rng.integers(0, 2, size=(n_samp, n))
        words = bitops.pack(jnp.asarray(bits))
        valid = jnp.asarray(rng.random(n_samp) < 0.9)
        words = jnp.where(
            valid[:, None], words,
            jnp.full_like(words, bitops.UINT(0xFFFFFFFF)),
        )
        sw, _, sv = keys.sort_words(words, valid.astype(jnp.int32))
        sv = sv.astype(bool) & keys.unique_mask(sw)
        la = jnp.asarray(rng.standard_normal(n_samp), jnp.float32)
        ph = jnp.asarray(rng.standard_normal(n_samp), jnp.float32)
        e_hash = PauliEngine(ham, membership="hash").local_energy_proxy(
            sw, la, ph, sv
        )
        e_search = PauliEngine(ham, membership="search").local_energy_proxy(
            sw, la, ph, sv
        )
        np.testing.assert_allclose(
            np.asarray(e_hash.e_re), np.asarray(e_search.e_re), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(e_hash.e_im), np.asarray(e_search.e_im), atol=1e-5
        )
        assert int(e_hash.found_pairs) == int(e_search.found_pairs)
        assert int(e_hash.table_overflow) == 0

    mol = Molecule.create(
        MolConfig(name="H2O"), mols_dir="mols", run_fci=False,
        run_cisd=False,
    )
    check(mol.qubit_ham, mol.qubit_num)

    # 40-qubit (2-word) embedding of a random 12-orbital problem.
    h1 = np.zeros((40, 40))
    sub = rng.standard_normal((12, 12))
    h1[:12, :12] = sub + sub.T
    v = np.zeros((40, 40, 40, 40))
    s4 = rng.standard_normal((12,) * 4)
    v[:12, :12, :12, :12] = s4 + s4.transpose(1, 0, 3, 2)
    ham40 = jordan_wigner_pauli_hamiltonian(h1, v)
    # Random states over the active 12 qubits (plus a few high bits to
    # exercise word 1 hashing).
    bits40 = np.zeros((64, 40), dtype=np.int64)
    bits40[:, :12] = rng.integers(0, 2, size=(64, 12))
    bits40[:, 35:38] = rng.integers(0, 2, size=(64, 3))
    words40 = bitops.pack(jnp.asarray(bits40))
    sw, _ = keys.sort_words(words40)
    sv = keys.unique_mask(sw)
    la = jnp.asarray(rng.standard_normal(64), jnp.float32)
    ph = jnp.asarray(rng.standard_normal(64), jnp.float32)
    e_hash = PauliEngine(ham40, membership="hash").local_energy_proxy(
        sw, la, ph, sv
    )
    e_search = PauliEngine(ham40, membership="search").local_energy_proxy(
        sw, la, ph, sv
    )
    np.testing.assert_allclose(
        np.asarray(e_hash.e_re), np.asarray(e_search.e_re), atol=1e-4
    )
    assert int(e_hash.found_pairs) == int(e_search.found_pairs)


def test_lookup_chunking_matches_unchunked():
    """Membership-query chunking (lax.map) is numerically identical for
    both table and hash paths."""
    import jax.numpy as jnp

    from anqs_quantum_chemistry_tpu.chem.molecule import Molecule, MolConfig
    from anqs_quantum_chemistry_tpu.observables.pauli import PauliEngine
    from anqs_quantum_chemistry_tpu.ops import bits as bitops, keys

    rng = np.random.default_rng(3)
    mol = Molecule.create(
        MolConfig(name="H2O"), mols_dir="mols", run_fci=False,
        run_cisd=False,
    )
    bits = rng.integers(0, 2, size=(64, mol.qubit_num))
    words = bitops.pack(jnp.asarray(bits))
    sw, _ = keys.sort_words(words)
    sv = keys.unique_mask(sw)
    la = jnp.asarray(rng.standard_normal(64), jnp.float32)
    ph = jnp.asarray(rng.standard_normal(64), jnp.float32)
    for mem in ("table", "hash"):
        a = PauliEngine(mol.qubit_ham, membership=mem).local_energy_proxy(
            sw, la, ph, sv
        )
        b = PauliEngine(
            mol.qubit_ham, membership=mem, lookup_chunk=1000
        ).local_energy_proxy(sw, la, ph, sv)
        np.testing.assert_allclose(
            np.asarray(a.e_re), np.asarray(b.e_re), atol=1e-6
        )
        assert int(a.found_pairs) == int(b.found_pairs)


def test_membership_prefilter_matches_search():
    """Output-sensitive prefilter membership == sorted binary search on a
    14-qubit molecule (W=1) and a 40-qubit embedding (W=2), including the
    dense-row fallback (tiny row capacity) and the dropped-row counter."""
    import jax.numpy as jnp

    from anqs_quantum_chemistry_tpu.chem.jw import (
        jordan_wigner_pauli_hamiltonian,
    )
    from anqs_quantum_chemistry_tpu.chem.molecule import Molecule, MolConfig
    from anqs_quantum_chemistry_tpu.observables.pauli import PauliEngine
    from anqs_quantum_chemistry_tpu.ops import bits as bitops, keys

    rng = np.random.default_rng(23)

    def prep(n, n_samp, active=None):
        active = active or n
        bits = np.zeros((n_samp, n), dtype=np.int64)
        bits[:, :active] = rng.integers(0, 2, size=(n_samp, active))
        words = bitops.pack(jnp.asarray(bits))
        valid = jnp.asarray(rng.random(n_samp) < 0.9)
        words = jnp.where(
            valid[:, None], words,
            jnp.full_like(words, bitops.UINT(0xFFFFFFFF)),
        )
        sw, _, sv = keys.sort_words(words, valid.astype(jnp.int32))
        sv = sv.astype(bool) & keys.unique_mask(sw)
        la = jnp.asarray(-np.abs(rng.standard_normal(n_samp)), jnp.float32)
        ph = jnp.asarray(rng.standard_normal(n_samp), jnp.float32)
        return sw, la, ph, sv

    def check(ham, sw, la, ph, sv, **kw):
        e_pf = PauliEngine(
            ham, membership="prefilter", **kw
        ).local_energy_proxy(sw, la, ph, sv)
        e_search = PauliEngine(ham, membership="search").local_energy_proxy(
            sw, la, ph, sv
        )
        np.testing.assert_allclose(
            np.asarray(e_pf.e_re), np.asarray(e_search.e_re),
            rtol=1e-4, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(e_pf.e_im), np.asarray(e_search.e_im),
            rtol=1e-4, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(e_pf.t_re), np.asarray(e_search.t_re),
            rtol=1e-5, atol=1e-6,
        )
        assert int(e_pf.found_pairs) == int(e_search.found_pairs)
        assert int(e_pf.table_overflow) == 0
        return e_pf

    mol = Molecule.create(
        MolConfig(name="H2O"), mols_dir="mols", run_fci=False,
        run_cisd=False,
    )
    sw, la, ph, sv = prep(mol.qubit_num, 96)
    e = check(mol.qubit_ham, sw, la, ph, sv)
    assert int(e.pf_dropped_rows) == 0

    # Row-blocked stage 1-3a pipeline (the Cr2-scale HBM fix: peak
    # intermediates are (block, M), not (B, M)) is bit-exact vs the
    # unchunked prefilter, including a non-dividing block size.
    e_blk = PauliEngine(
        mol.qubit_ham, membership="prefilter", pf_row_chunk=40,
    ).local_energy_proxy(sw, la, ph, sv)
    for f in ("e_re", "e_im", "t_re", "t_im"):
        np.testing.assert_array_equal(
            np.asarray(getattr(e_blk, f)), np.asarray(getattr(e, f))
        )
    assert int(e_blk.found_pairs) == int(e.found_pairs)
    assert int(e_blk.pf_dropped_rows) == 0

    # Tiny row capacity forces the dense fallback; large enough dense-row
    # buffer keeps the result exact.
    e = check(
        mol.qubit_ham, sw, la, ph, sv,
        prefilter_row_capacity=2, prefilter_dense_rows=96,
    )
    assert int(e.pf_dropped_rows) == 0

    # Dense fallback under row blocking (row_count crosses block
    # boundaries; the fallback itself stays global).
    e = check(
        mol.qubit_ham, sw, la, ph, sv,
        prefilter_row_capacity=2, prefilter_dense_rows=96,
        pf_row_chunk=32,
    )
    assert int(e.pf_dropped_rows) == 0

    # Tiny dense-row buffer too: dropped rows are counted (not silent).
    e_trunc = PauliEngine(
        mol.qubit_ham, membership="prefilter",
        prefilter_row_capacity=1, prefilter_dense_rows=1,
    ).local_energy_proxy(sw, la, ph, sv)
    assert int(e_trunc.pf_dropped_rows) > 0

    # 40-qubit (W=2) embedding of a random 12-orbital problem.
    h1 = np.zeros((40, 40))
    sub = rng.standard_normal((12, 12))
    h1[:12, :12] = sub + sub.T
    v = np.zeros((40, 40, 40, 40))
    s4 = rng.standard_normal((12,) * 4)
    v[:12, :12, :12, :12] = s4 + s4.transpose(1, 0, 3, 2)
    ham40 = jordan_wigner_pauli_hamiltonian(h1, v)
    sw, la, ph, sv = prep(40, 64, active=12)
    check(ham40, sw, la, ph, sv)


def test_membership_multiword_70q_hash_prefilter_vs_search():
    """Fast membership beyond 64 qubits (W=3): both the bucket-hash and
    the fingerprint-prefilter backends reproduce the word-agnostic sorted
    binary search on a 70-qubit embedding whose active orbitals span all
    three word boundaries (round-2 VERDICT missing #3; reference
    find_a_in_b is word-count-agnostic, hilbert_space.py:263-284)."""
    import jax.numpy as jnp

    from anqs_quantum_chemistry_tpu.chem.jw import (
        jordan_wigner_pauli_hamiltonian,
    )
    from anqs_quantum_chemistry_tpu.observables.pauli import PauliEngine
    from anqs_quantum_chemistry_tpu.ops import bits as bitops, keys

    rng = np.random.default_rng(29)
    n = 70
    # Active orbitals straddling the 32- and 64-bit word boundaries so
    # flips and sample bits touch every word.
    act = [0, 1, 30, 31, 32, 33, 62, 63, 64, 69]
    h1 = np.zeros((n, n))
    sub = rng.standard_normal((len(act), len(act)))
    h1[np.ix_(act, act)] = sub + sub.T
    v = np.zeros((n, n, n, n))
    s4 = rng.standard_normal((len(act),) * 4)
    v[np.ix_(act, act, act, act)] = s4 + s4.transpose(1, 0, 3, 2)
    ham = jordan_wigner_pauli_hamiltonian(h1, v)
    assert ham.a_masks.shape[1] == 3  # really 3 words

    n_samp = 96
    bits = np.zeros((n_samp, n), dtype=np.int64)
    bits[:, act] = rng.integers(0, 2, size=(n_samp, len(act)))
    words = bitops.pack(jnp.asarray(bits))
    valid = jnp.asarray(rng.random(n_samp) < 0.9)
    words = jnp.where(
        valid[:, None], words,
        jnp.full_like(words, bitops.UINT(0xFFFFFFFF)),
    )
    sw, _, sv = keys.sort_words(words, valid.astype(jnp.int32))
    sv = sv.astype(bool) & keys.unique_mask(sw)
    la = jnp.asarray(-np.abs(rng.standard_normal(n_samp)), jnp.float32)
    ph = jnp.asarray(rng.standard_normal(n_samp), jnp.float32)

    ref = PauliEngine(ham, membership="search").local_energy_proxy(
        sw, la, ph, sv
    )
    assert int(ref.found_pairs) > 0  # the comparison is non-vacuous
    for mem in ("hash", "prefilter"):
        got = PauliEngine(ham, membership=mem).local_energy_proxy(
            sw, la, ph, sv
        )
        np.testing.assert_allclose(
            np.asarray(got.e_re), np.asarray(ref.e_re),
            rtol=1e-4, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(got.t_re), np.asarray(ref.t_re),
            rtol=1e-5, atol=1e-6,
        )
        assert int(got.found_pairs) == int(ref.found_pairs)
        assert int(got.table_overflow) == 0
    # 'auto' now picks a fast backend (not the 13-30x slower search) in
    # the >64-qubit regime.
    assert PauliEngine(ham).membership == "prefilter"


def test_prefilter_is_auto_above_table_range():
    """'auto' membership picks the fingerprint prefilter for n > 22
    (<= 64 qubits, any parity)."""
    from anqs_quantum_chemistry_tpu.chem.jw import (
        jordan_wigner_pauli_hamiltonian,
    )
    from anqs_quantum_chemistry_tpu.observables.pauli import PauliEngine

    rng = np.random.default_rng(5)
    h1 = np.zeros((26, 26))
    sub = rng.standard_normal((6, 6))
    h1[:6, :6] = sub + sub.T
    ham = jordan_wigner_pauli_hamiltonian(h1, np.zeros((26,) * 4))
    assert PauliEngine(ham).membership == "prefilter"


def test_grouped_matrix_elements_match_split():
    """'grouped' (class-major padded reduces, no dense (T, M) operand) ==
    'split' (bf16 split matmuls) local energies; needed for large-M
    molecules where the dense operand would be GBs (C2H4/6-31G: 13 GB)."""
    import jax.numpy as jnp

    from anqs_quantum_chemistry_tpu.chem.molecule import Molecule, MolConfig
    from anqs_quantum_chemistry_tpu.observables.pauli import PauliEngine
    from anqs_quantum_chemistry_tpu.ops import bits as bitops, keys

    mol = Molecule.create(
        MolConfig(name="H2O"), mols_dir="mols", run_fci=False,
        run_cisd=False,
    )
    rng = np.random.default_rng(17)
    n = mol.qubit_num
    bits = rng.integers(0, 2, size=(64, n))
    words = bitops.pack(jnp.asarray(bits))
    sw, _ = keys.sort_words(words)
    sv = keys.unique_mask(sw)
    la = jnp.asarray(-np.abs(rng.standard_normal(64)), jnp.float32)
    ph = jnp.asarray(rng.standard_normal(64), jnp.float32)

    e_g = PauliEngine(
        mol.qubit_ham, weights_matmul="grouped", membership="search"
    ).local_energy_proxy(sw, la, ph, sv)
    e_s = PauliEngine(
        mol.qubit_ham, weights_matmul="split", membership="search"
    ).local_energy_proxy(sw, la, ph, sv)
    np.testing.assert_allclose(
        np.asarray(e_g.e_re), np.asarray(e_s.e_re), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(e_g.t_re), np.asarray(e_s.t_re), rtol=1e-5, atol=1e-6
    )
    assert int(e_g.found_pairs) == int(e_s.found_pairs)

    # grouped + prefilter membership together (the C2H4 configuration).
    e_gp = PauliEngine(
        mol.qubit_ham, weights_matmul="grouped", membership="prefilter"
    ).local_energy_proxy(sw, la, ph, sv)
    np.testing.assert_allclose(
        np.asarray(e_gp.e_re), np.asarray(e_s.e_re), rtol=1e-5, atol=1e-5
    )
    assert int(e_gp.found_pairs) == int(e_s.found_pairs)
