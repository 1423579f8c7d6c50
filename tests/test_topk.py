"""exact_top_k must be bit-identical to jax.lax.top_k (NaN-free input)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from anqs_quantum_chemistry_tpu.ops.topk import exact_top_k

NEG = -1e30


@pytest.mark.parametrize("n,k", [(1000, 1), (1000, 17), (4096, 1024),
                                 (100000, 8192), (257, 257)])
def test_matches_lax_top_k_random(n, k):
    x = jax.random.normal(jax.random.PRNGKey(n + k), (n,)) * 100.0
    v_ref, i_ref = jax.lax.top_k(x, k)
    v, i = jax.jit(exact_top_k, static_argnums=1)(x, k)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))
    np.testing.assert_array_equal(np.asarray(v), np.asarray(v_ref))


def test_massive_ties_lowest_index_first():
    # 90% duplicates straddling the threshold: tie-break must be by index.
    key = jax.random.PRNGKey(0)
    base = jnp.round(jax.random.normal(key, (20000,)) * 3.0)
    v_ref, i_ref = jax.lax.top_k(base, 5000)
    v, i = exact_top_k(base, 5000)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))
    np.testing.assert_array_equal(np.asarray(v), np.asarray(v_ref))


def test_neg_sentinel_fill():
    # The sampler's workload: most entries are the NEG sentinel.
    key = jax.random.PRNGKey(3)
    x = jnp.full((50000,), NEG, jnp.float32)
    live = jax.random.choice(key, 50000, (300,), replace=False)
    x = x.at[live].set(jax.random.normal(jax.random.PRNGKey(4), (300,)))
    for k in (100, 300, 2000):
        v_ref, i_ref = jax.lax.top_k(x, k)
        v, i = exact_top_k(x, k)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))
        np.testing.assert_array_equal(np.asarray(v), np.asarray(v_ref))


def test_negatives_and_zeros():
    x = jnp.asarray([-0.0, 0.0, -1.5, 3.25, -1e30, 7.0, 7.0, -2.0])
    for k in (1, 3, 8):
        v_ref, i_ref = jax.lax.top_k(x, k)
        v, i = exact_top_k(x, k)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))
        np.testing.assert_array_equal(np.asarray(v), np.asarray(v_ref))


def test_all_equal():
    x = jnp.full((1024,), 2.5)
    v, i = exact_top_k(x, 64)
    np.testing.assert_array_equal(np.asarray(i), np.arange(64))
    np.testing.assert_array_equal(np.asarray(v), np.full(64, 2.5))


def test_grad_through_values():
    # SR never differentiates through selection, but keep the op
    # differentiable w.r.t. the selected values (gather gradient).
    x = jax.random.normal(jax.random.PRNGKey(9), (512,))

    def f(x):
        v, _ = exact_top_k(x, 32)
        return jnp.sum(v**2)

    g = jax.grad(f)(x)
    _, idx = exact_top_k(x, 32)
    mask = np.zeros(512, bool)
    mask[np.asarray(idx)] = True
    assert np.all(np.asarray(g)[~mask] == 0.0)
    np.testing.assert_allclose(
        np.asarray(g)[mask], 2 * np.asarray(x)[mask], rtol=1e-6
    )


def test_sampler_bisect_bit_exact():
    # Gumbel + multinomial samplers with topk_impl='bisect' must be
    # bit-identical to the 'lax' default (exact_top_k is a drop-in).
    from tests.test_sampler import setup

    from anqs_quantum_chemistry_tpu.sampling import (
        gumbel_top_k_sample,
        multinomial_sample,
    )

    _, anqs, params, _, _, _ = setup()
    key = jax.random.PRNGKey(7)
    a = gumbel_top_k_sample(anqs, params, key, 12, topk_impl="lax")
    b = gumbel_top_k_sample(anqs, params, key, 12, topk_impl="bisect")
    np.testing.assert_array_equal(np.asarray(a.words), np.asarray(b.words))
    np.testing.assert_array_equal(
        np.asarray(a.log_probs), np.asarray(b.log_probs)
    )
    ma = multinomial_sample(anqs, params, key, 12, 4000, topk_impl="lax")
    mb = multinomial_sample(anqs, params, key, 12, 4000, topk_impl="bisect")
    np.testing.assert_array_equal(np.asarray(ma.words), np.asarray(mb.words))
    np.testing.assert_array_equal(
        np.asarray(ma.counts), np.asarray(mb.counts)
    )
