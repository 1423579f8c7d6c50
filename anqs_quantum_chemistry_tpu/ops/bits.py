"""Bit-packed determinant codec and bit kernels (pure jnp, 32-bit words).

A basis state (Slater determinant) on ``n`` qubits is stored as ``W =
ceil(n/32)`` little-endian uint32 words: qubit ``i`` lives in bit ``i % 32`` of
word ``i // 32``. All functions are shape-polymorphic over leading batch dims.

This is the TPU-native counterpart of the reference codec
(reference: nqs/nqs/base/hilbert_space.py:121-198, which uses int64 words and a
CUDA ``__popcll`` kernel); 32-bit words are used instead because TPUs operate
natively on 32-bit lanes.
"""

from __future__ import annotations

import jax.numpy as jnp

WORD_BITS = 32
UINT = jnp.uint32

# SWAR popcount constants for 32-bit words.
_M1 = 0x55555555
_M2 = 0x33333333
_M4 = 0x0F0F0F0F


def n_words(qubit_num: int) -> int:
    """Number of uint32 words needed to store ``qubit_num`` qubits."""
    return -(-qubit_num // WORD_BITS)


def pack(bits):
    """Pack ``(..., n)`` 0/1 integers into ``(..., W)`` uint32 words."""
    n = bits.shape[-1]
    w = n_words(n)
    pad = w * WORD_BITS - n
    b = bits.astype(UINT)
    if pad:
        b = jnp.concatenate(
            [b, jnp.zeros((*b.shape[:-1], pad), dtype=UINT)], axis=-1
        )
    b = b.reshape(*b.shape[:-1], w, WORD_BITS)
    shifts = jnp.arange(WORD_BITS, dtype=UINT)
    return jnp.sum(b << shifts, axis=-1).astype(UINT)


def unpack(words, qubit_num: int, dtype=jnp.int32):
    """Unpack ``(..., W)`` uint32 words into ``(..., qubit_num)`` 0/1 values."""
    shifts = jnp.arange(WORD_BITS, dtype=UINT)
    bits = (words[..., None] >> shifts) & UINT(1)
    bits = bits.reshape(*words.shape[:-1], words.shape[-1] * WORD_BITS)
    return bits[..., :qubit_num].astype(dtype)


def popcount_word(w):
    """Per-element popcount of a uint32 array (SWAR, branchless)."""
    w = w.astype(UINT)
    w = w - ((w >> UINT(1)) & UINT(_M1))
    w = (w & UINT(_M2)) + ((w >> UINT(2)) & UINT(_M2))
    w = (w + (w >> UINT(4))) & UINT(_M4)
    return ((w * UINT(0x01010101)) >> UINT(24)).astype(jnp.int32)


def popcount(words):
    """Total popcount over the word axis: ``(..., W) -> (...,)`` int32."""
    return jnp.sum(popcount_word(words), axis=-1)


def popcount_hw(words):
    """Hardware popcount via ``jnp.bitwise_count`` -- the second of the
    reference's redundant popcount modes kept for cross-checking
    (reference: hilbert_space.py:158-198 keeps three)."""
    return jnp.sum(
        jnp.bitwise_count(words).astype(jnp.int32), axis=-1
    )


def permute_qubits(words, perm, qubit_num: int):
    """Reorder qubits: output bit ``i`` = input bit ``perm[i]``.

    The reference's qubit permutation hooks (perm/inv_perm,
    hilbert_space.py:97-104,230-237) support orbital-reordering
    experiments; here it is a bit gather over the unpacked representation
    (off the hot path -- used at preparation time).
    """
    bits = unpack(words, qubit_num)
    perm = jnp.asarray(perm, dtype=jnp.int32)
    return pack(jnp.take(bits, perm, axis=-1))


def parity(words):
    """Parity (popcount mod 2) over the word axis: ``(..., W) -> (...,)``."""
    w = words[..., 0]
    for j in range(1, words.shape[-1]):
        w = w ^ words[..., j]
    w = w ^ (w >> UINT(16))
    w = w ^ (w >> UINT(8))
    w = w ^ (w >> UINT(4))
    w = w ^ (w >> UINT(2))
    w = w ^ (w >> UINT(1))
    return (w & UINT(1)).astype(jnp.int32)


def set_bit_range(words, start: int, width: int, value):
    """Write ``value`` (ints < 2**width) into qubits [start, start+width).

    ``start``/``width`` are static; ``value`` has shape ``words.shape[:-1]``.
    The target bits are assumed to be currently zero (ancestral sampling only
    ever appends to an all-zero suffix).
    """
    assert width <= WORD_BITS
    value = value.astype(UINT)
    w0, off = start // WORD_BITS, start % WORD_BITS
    out = []
    for j in range(words.shape[-1]):
        piece = words[..., j]
        if j == w0:
            piece = piece | (value << UINT(off))
        elif j == w0 + 1 and off + width > WORD_BITS:
            piece = piece | (value >> UINT(WORD_BITS - off))
        out.append(piece)
    return jnp.stack(out, axis=-1)


def get_bit_range(words, start: int, width: int):
    """Read qubits [start, start+width) as an integer; static start/width."""
    assert width <= WORD_BITS
    w0, off = start // WORD_BITS, start % WORD_BITS
    lo = words[..., w0] >> UINT(off)
    if off + width > WORD_BITS:
        hi = words[..., w0 + 1] << UINT(WORD_BITS - off)
        lo = lo | hi
    if width == WORD_BITS:
        return lo.astype(jnp.int32)
    return (lo & UINT((1 << width) - 1)).astype(jnp.int32)


def set_bit_range_dyn(words, start, width: int, value):
    """``set_bit_range`` with a *traced* ``start`` (int32 scalar).

    Enables ``lax.scan`` over qudits in the samplers: the qudit's bit offset
    comes from a device-side table instead of a Python int. ``width`` stays
    static (the maximum qudit width); callers guarantee ``value < 2**width``
    and that the target bits are currently zero.
    """
    assert width <= WORD_BITS
    value = value.astype(UINT)
    w0 = start // WORD_BITS
    off = (start % WORD_BITS).astype(UINT)
    lo = value << off
    hi = jnp.where(
        off == 0, UINT(0), value >> (UINT(WORD_BITS) - jnp.maximum(off, 1))
    )
    j = jnp.arange(words.shape[-1], dtype=jnp.int32)
    return (
        words
        | jnp.where(j == w0, lo[..., None], UINT(0))
        | jnp.where(j == w0 + 1, hi[..., None], UINT(0))
    )


def get_bit_range_dyn(words, start, width: int):
    """``get_bit_range`` with a *traced* ``start`` (int32 scalar).

    Bits beyond the last qubit are zero by construction, so reading a
    narrower final qudit with the full static ``width`` is harmless.
    """
    assert width <= WORD_BITS
    w0 = start // WORD_BITS
    off = (start % WORD_BITS).astype(UINT)
    j = jnp.arange(words.shape[-1], dtype=jnp.int32)
    lo_word = jnp.sum(jnp.where(j == w0, words, UINT(0)), axis=-1)
    hi_word = jnp.sum(jnp.where(j == w0 + 1, words, UINT(0)), axis=-1)
    lo = lo_word >> off
    hi = jnp.where(
        off == 0, UINT(0), hi_word << (UINT(WORD_BITS) - jnp.maximum(off, 1))
    )
    v = lo | hi
    if width < WORD_BITS:
        v = v & UINT((1 << width) - 1)
    return v.astype(jnp.int32)


def interleave_swap(words, qubit_num: int):
    """Swap even/odd qubits (alpha <-> beta spin-orbitals) in packed form.

    Counterpart of the reference's spin-flip base-vector transform
    (reference: nqs/nqs/stochastic/ansatzes/anqs/abstract_anqs.py:841-850).
    Assumes ``qubit_num`` is even; bits above ``qubit_num`` must be zero.
    """
    even = words & UINT(_M1)
    odd = words & UINT(0xAAAAAAAA)
    return (even << UINT(1)) | (odd >> UINT(1))
