import numpy as np
import jax.numpy as jnp

from anqs_quantum_chemistry_tpu.ops import bits


def random_bits(rng, b, n):
    return rng.integers(0, 2, size=(b, n), dtype=np.int64)


def test_pack_unpack_roundtrip(rng):
    for n in [1, 7, 32, 33, 64, 70, 100]:
        x = random_bits(rng, 50, n)
        words = bits.pack(jnp.asarray(x))
        assert words.shape == (50, bits.n_words(n))
        assert words.dtype == jnp.uint32
        back = np.asarray(bits.unpack(words, n))
        np.testing.assert_array_equal(back, x)


def test_popcount_and_parity(rng):
    for n in [17, 32, 61, 96]:
        x = random_bits(rng, 80, n)
        words = bits.pack(jnp.asarray(x))
        np.testing.assert_array_equal(np.asarray(bits.popcount(words)), x.sum(1))
        np.testing.assert_array_equal(np.asarray(bits.parity(words)), x.sum(1) % 2)


def test_set_get_bit_range(rng):
    n = 70
    for start, width in [(0, 6), (28, 6), (30, 4), (31, 2), (62, 6), (64, 6), (66, 4)]:
        x = random_bits(rng, 40, n)
        x[:, start : start + width] = 0
        words = bits.pack(jnp.asarray(x))
        vals = jnp.asarray(rng.integers(0, 2**width, size=(40,)))
        out = bits.set_bit_range(words, start, width, vals)
        expected = x.copy()
        for j in range(width):
            expected[:, start + j] = (np.asarray(vals) >> j) & 1
        np.testing.assert_array_equal(np.asarray(bits.unpack(out, n)), expected)
        np.testing.assert_array_equal(
            np.asarray(bits.get_bit_range(out, start, width)), np.asarray(vals)
        )


def test_interleave_swap(rng):
    n = 64
    x = random_bits(rng, 30, n)
    words = bits.pack(jnp.asarray(x))
    swapped = bits.interleave_swap(words, n)
    expected = x.copy()
    expected[:, 0::2], expected[:, 1::2] = x[:, 1::2], x[:, 0::2]
    np.testing.assert_array_equal(np.asarray(bits.unpack(swapped, n)), expected)


def test_popcount_hw_matches_swar(rng):
    import jax.numpy as jnp

    from anqs_quantum_chemistry_tpu.ops import bits as bitops

    words = jnp.asarray(
        rng.integers(0, 1 << 32, size=(64, 3), dtype=np.uint64).astype(
            np.uint32
        )
    )
    np.testing.assert_array_equal(
        np.asarray(bitops.popcount(words)),
        np.asarray(bitops.popcount_hw(words)),
    )


def test_permute_qubits_roundtrip(rng):
    import jax.numpy as jnp

    from anqs_quantum_chemistry_tpu.ops import bits as bitops

    n = 45
    bits = rng.integers(0, 2, size=(32, n))
    words = bitops.pack(jnp.asarray(bits))
    perm = rng.permutation(n)
    out = bitops.permute_qubits(words, perm, n)
    np.testing.assert_array_equal(
        np.asarray(bitops.unpack(out, n)), bits[:, perm]
    )
    # inverse permutation restores the original
    inv = np.argsort(perm)
    back = bitops.permute_qubits(out, inv, n)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(words))
