"""Multi-word key ordering: lexicographic sort, binary search, dedup.

Packed determinants are ``(B, W)`` uint32 words (little-endian: word ``W-1`` is
most significant). The canonical order is the unsigned integer order of the
full bit string. These primitives replace the reference's
concat-unique-scatter set algebra (reference: nqs/nqs/base/hilbert_space.py:
200-284 -- ``two_unique2cat_unique``/``compute_unique_indices``/
``sort_base_idx``/``find_a_in_b``) with sort/searchsorted formulations that
compile to static shapes on TPU.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .bits import UINT


def lex_less(a, b):
    """Elementwise canonical a < b over the trailing word axis."""
    w = a.shape[-1]
    less = jnp.zeros(a.shape[:-1], dtype=bool)
    decided = jnp.zeros(a.shape[:-1], dtype=bool)
    for j in range(w - 1, -1, -1):
        word_ne = a[..., j] != b[..., j]
        word_lt = a[..., j] < b[..., j]
        less = jnp.where(~decided & word_ne, word_lt, less)
        decided = decided | word_ne
    return less


def lex_eq(a, b):
    """Elementwise equality over the trailing word axis."""
    eq = a[..., 0] == b[..., 0]
    for j in range(1, a.shape[-1]):
        eq = eq & (a[..., j] == b[..., j])
    return eq


def sort_words(words, *extra):
    """Canonically sort rows of ``(B, W)`` words, carrying extras along.

    Returns ``(sorted_words, perm)`` (plus sorted extras, appended). Uses
    ``lax.sort`` with W lexicographic keys (most significant word first).
    """
    b, w = words.shape
    operands = tuple(words[:, j] for j in range(w - 1, -1, -1))
    perm = jnp.arange(b, dtype=jnp.int32)
    results = jax.lax.sort(
        operands + (perm,) + tuple(extra), num_keys=w, is_stable=True
    )
    sorted_words = jnp.stack(results[w - 1 :: -1], axis=-1)
    return (sorted_words, results[w]) + tuple(results[w + 1 :])


def searchsorted_words(sorted_words, queries):
    """Lower-bound binary search of ``(Q, W)`` queries in sorted ``(B, W)``.

    Returns ``(idx, found)``: ``idx`` is the insertion position (int32) and
    ``found`` marks exact matches. Branchless ``ceil(log2(B+1))`` iterations.

    All table reads are per-word 1D gathers: a 2D row gather
    ``sorted_words[mid]`` hits XLA:TPU's slow general-gather path (~1000x
    slower than the 1D fast path -- measured 482 ms vs 0.03 ms for 4.4M
    queries against an 8K table on v5e).
    """
    b, w = sorted_words.shape
    cols = tuple(sorted_words[:, j] for j in range(w))
    qcols = tuple(queries[..., j] for j in range(w))
    q_shape = queries.shape[:-1]
    lo = jnp.zeros(q_shape, dtype=jnp.int32)
    hi = jnp.full(q_shape, b, dtype=jnp.int32)

    def lex_cmp_at(pos):
        """(keys[pos] < query, keys[pos] != query); 1D gathers per word."""
        less = jnp.zeros(q_shape, dtype=bool)
        decided = jnp.zeros(q_shape, dtype=bool)
        for j in range(w - 1, -1, -1):
            kj = cols[j][pos]
            word_ne = kj != qcols[j]
            less = jnp.where(~decided & word_ne, kj < qcols[j], less)
            decided = decided | word_ne
        return less, decided

    for _ in range(max(1, math.ceil(math.log2(b + 1)))):
        active = lo < hi
        mid = (lo + hi) >> 1
        go_right, _ = lex_cmp_at(jnp.clip(mid, 0, b - 1))
        lo = jnp.where(active & go_right, mid + 1, lo)
        hi = jnp.where(active & ~go_right, mid, hi)
    safe = jnp.clip(lo, 0, b - 1)
    _, unequal = lex_cmp_at(safe)
    found = (lo < b) & ~unequal
    return lo, found


def unique_mask(sorted_words, valid=None):
    """First-occurrence mask over canonically sorted rows.

    ``valid`` rows (if given) must be sorted to the front; invalid rows are
    never marked unique.
    """
    first = jnp.ones(sorted_words.shape[0], dtype=bool)
    dup = lex_eq(sorted_words[1:], sorted_words[:-1])
    first = first.at[1:].set(~dup)
    if valid is not None:
        first = first & valid
    return first
