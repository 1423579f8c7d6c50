"""Sampler statistics vs exact |psi|^2 (SURVEY.md section 4 item c)."""

import itertools

import numpy as np
import jax
import jax.numpy as jnp

from anqs_quantum_chemistry_tpu.models import ANQS, AnqsConfig
from anqs_quantum_chemistry_tpu.ops import bits as bitops
from anqs_quantum_chemistry_tpu.sampling import (
    gumbel_top_k_sample,
    multinomial_sample,
)
from anqs_quantum_chemistry_tpu.symmetries import (
    Masker,
    QubitGrouping,
    particle_number_symmetry,
    spin_projection_symmetry,
)


def setup(n=8, qpq=3):
    masker = Masker(
        [
            particle_number_symmetry(n, 4),
            spin_projection_symmetry(n, 0),
        ]
    )
    grouping = QubitGrouping.create(masker, qubit_per_qudit=qpq)
    anqs = ANQS(grouping, AnqsConfig(hidden_widths=(32,)))
    params = anqs.init(jax.random.PRNGKey(1))
    x = np.array(
        list(itertools.product([0, 1], repeat=n)), dtype=np.int64
    )[:, ::-1]
    phys = masker.is_physical(x)
    words_all = bitops.pack(jnp.asarray(np.ascontiguousarray(x)))
    la, _ = anqs.log_psi(params, words_all)
    probs = np.exp(2 * np.asarray(la, np.float64))
    return masker, anqs, params, x, phys, probs


def as_ints(words, n):
    bits = np.asarray(bitops.unpack(words, n))
    return bits @ (1 << np.arange(n, dtype=np.int64))


def test_multinomial_exactness_and_distribution():
    n = 8
    masker, anqs, params, x, phys, probs = setup(n)
    budget = 4000
    out = multinomial_sample(
        anqs, params, jax.random.PRNGKey(5), budget, budget
    )
    counts = np.asarray(out.counts)
    valid = np.asarray(out.valid)
    assert int(out.dropped) == 0
    assert counts[valid].sum() == budget
    ints = as_ints(out.words, n)
    # all sampled states physical and unique
    phys_ints = set(np.nonzero(phys)[0].tolist())
    sampled = ints[valid]
    assert set(sampled.tolist()) <= phys_ints
    assert len(set(sampled.tolist())) == valid.sum()
    # empirical vs theoretical frequencies (multinomial noise ~ sqrt(p/N))
    emp = np.zeros(2**n)
    emp[sampled] = counts[valid] / budget
    err = np.abs(emp - probs)
    bound = 5 * np.sqrt(np.maximum(probs, 1e-6) / budget) + 5 / budget
    assert (err < bound).all(), (
        err.max(), probs[np.argmax(err)], emp[np.argmax(err)]
    )


def test_multinomial_1e8_budget_exact():
    """Reference-scale 1e8 budgets (sandbox_qchem.py:54,135): counts stay
    exact (f64 bisection carrier) -- every one of the 10^8 samples is
    accounted for, and empirical frequencies match |psi|^2 to the much
    tighter 1/sqrt(1e8) multinomial noise floor."""
    n = 8
    masker, anqs, params, x, phys, probs = setup(n)
    budget = 100_000_000
    out = multinomial_sample(
        anqs, params, jax.random.PRNGKey(7), 64, budget
    )
    counts = np.asarray(out.counts, np.int64)
    valid = np.asarray(out.valid)
    # capacity 64 >= |support| (36 states) -> nothing dropped, and the
    # total is EXACTLY the budget (the f32 carrier lost counts here).
    assert int(out.dropped) == 0
    assert counts[valid].sum() == budget
    ints = as_ints(out.words, n)
    sampled = ints[valid]
    assert set(sampled.tolist()) <= set(np.nonzero(phys)[0].tolist())
    emp = np.zeros(2**n)
    emp[sampled] = counts[valid] / budget
    err = np.abs(emp - probs)
    bound = 5 * np.sqrt(np.maximum(probs, 1e-9) / budget) + 5 / budget
    assert (err < bound).all(), (
        err.max(), probs[np.argmax(err)], emp[np.argmax(err)]
    )


def test_gumbel_full_support_recovery():
    """K >= |support| must return exactly the whole physical support."""
    n = 8
    masker, anqs, params, x, phys, probs = setup(n)
    n_phys = int(phys.sum())
    k = n_phys + 8
    out = gumbel_top_k_sample(anqs, params, jax.random.PRNGKey(2), k)
    valid = np.asarray(out.valid)
    assert valid.sum() == n_phys
    ints = as_ints(out.words, n)[valid]
    assert set(ints.tolist()) == set(np.nonzero(phys)[0].tolist())
    # renormalized log-probs must match |psi|^2 restricted to the set
    lp = np.asarray(out.log_probs, np.float64)[valid]
    np.testing.assert_allclose(
        np.exp(lp), probs[ints] / probs[ints].sum(), rtol=2e-3, atol=1e-6
    )


def test_gumbel_partial_k_distinct_physical():
    n = 8
    masker, anqs, params, x, phys, probs = setup(n)
    k = 10
    out = gumbel_top_k_sample(anqs, params, jax.random.PRNGKey(3), k)
    valid = np.asarray(out.valid)
    assert valid.sum() == k
    ints = as_ints(out.words, n)[valid]
    assert len(set(ints.tolist())) == k
    assert set(ints.tolist()) <= set(np.nonzero(phys)[0].tolist())
    # weights positive and normalized
    lp = np.asarray(out.log_probs, np.float64)[valid]
    assert abs(np.exp(lp).sum() - 1.0) < 1e-3
