import numpy as np
import jax.numpy as jnp

from anqs_quantum_chemistry_tpu.ops import bits, keys


def make_words(rng, b, n):
    x = rng.integers(0, 2, size=(b, n), dtype=np.int64)
    return bits.pack(jnp.asarray(x)), x


def as_int(x):
    # big integer value of each bit row (qubit 0 = LSB)
    return np.array([int("".join(map(str, row[::-1])), 2) for row in x],
                    dtype=object)


def test_lex_less_eq(rng):
    w1, x1 = make_words(rng, 200, 45)
    w2, x2 = make_words(rng, 200, 45)
    v1, v2 = as_int(x1), as_int(x2)
    np.testing.assert_array_equal(np.asarray(keys.lex_less(w1, w2)), v1 < v2)
    np.testing.assert_array_equal(np.asarray(keys.lex_eq(w1, w1)), True)


def test_sort_words(rng):
    w, x = make_words(rng, 300, 70)
    extra = jnp.asarray(rng.normal(size=300).astype(np.float32))
    sorted_w, perm, sorted_extra = keys.sort_words(w, extra)
    vals = as_int(x)
    order = np.argsort(vals, kind="stable")
    np.testing.assert_array_equal(as_int(np.asarray(
        bits.unpack(sorted_w, 70))), vals[order])
    np.testing.assert_allclose(np.asarray(sorted_extra),
                               np.asarray(extra)[order])
    np.testing.assert_array_equal(np.asarray(perm), order)


def test_searchsorted_words(rng):
    w, x = make_words(rng, 128, 40)
    sorted_w, _ = keys.sort_words(w)
    # queries: half present, half random
    q_present, xq = make_words(rng, 0, 40), None
    queries = jnp.concatenate([sorted_w[::3], make_words(rng, 60, 40)[0]])
    idx, found = keys.searchsorted_words(sorted_w, queries)
    sorted_vals = np.sort(as_int(x))
    qvals = as_int(np.asarray(bits.unpack(queries, 40)))
    expected_idx = np.searchsorted(sorted_vals, qvals)
    np.testing.assert_array_equal(np.asarray(idx), expected_idx)
    expected_found = np.isin(qvals, sorted_vals)
    np.testing.assert_array_equal(np.asarray(found), expected_found)


def test_unique_mask(rng):
    x = rng.integers(0, 5, size=(100, 8))  # lots of duplicates
    w = bits.pack(jnp.asarray((x > 2).astype(np.int64)))
    sorted_w, _ = keys.sort_words(w)
    mask = np.asarray(keys.unique_mask(sorted_w))
    vals = as_int(np.asarray(bits.unpack(sorted_w, 8)))
    expected = np.ones(100, dtype=bool)
    expected[1:] = vals[1:] != vals[:-1]
    np.testing.assert_array_equal(mask, expected)
