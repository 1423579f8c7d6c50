"""Exact top-k selection via value-domain bisection (TPU-friendly).

``jax.lax.top_k`` with a large ``k`` lowers to a (partial) sort on TPU --
an O(n log n) multi-pass shuffle that dominates the Gumbel sampler's
last qudit step (the (frontier * D)-candidate selection,
sampling/sampler.py:157). For selection, a sort is overkill: the k-th
largest *value* can be found with a 32-step binary search on the
float's order-isomorphic integer image, each step a single cheap
reduction (sequential HBM reads, no data movement), followed by one
stable compaction of the k winners. Total traffic ~36 linear passes
over ``x`` with no shuffles, vs a bitonic sort's log^2(n) shuffle
rounds.

``exact_top_k`` reproduces ``jax.lax.top_k`` semantics bit-exactly for
NaN-free input (values descending, ties broken by lowest index), so it
is a drop-in replacement -- asserted against ``lax.top_k`` in
tests/test_topk.py.

Reference counterpart: the reference's sampler keeps ``torch.topk``
(renormalize_and_sample_exclusive, abstract_anqs.py:690-776); this is
the TPU-native redesign of the same selection primitive.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _ordered_uint(x):
    """Order-isomorphic map float -> unsigned of the same width
    (monotone: x < y <=> u(x) < u(y)).

    Standard sign-magnitude fix-up: flip all bits of negatives, flip
    only the sign bit of non-negatives. NaN-free input assumed.
    """
    if x.dtype in (jnp.int32, jnp.int64):
        bits = jnp.iinfo(x.dtype).bits
        utype = jnp.uint32 if bits == 32 else jnp.uint64
        # Signed int: flipping the sign bit makes unsigned order match.
        return (
            jax.lax.bitcast_convert_type(x, utype)
            ^ utype(1 << (bits - 1)),
            bits,
        )
    if x.dtype == jnp.float64:
        utype, bits = jnp.uint64, 64
    else:
        utype, bits = jnp.uint32, 32
        x = x.astype(jnp.float32)
    b = jax.lax.bitcast_convert_type(x, utype)
    sign = b >> utype(bits - 1)
    return jnp.where(sign == 1, ~b, b | utype(1 << (bits - 1))), bits


def exact_top_k(x, k: int):
    """Exact (values, indices) of the k largest entries of 1-D ``x``.

    Bit-identical to ``jax.lax.top_k(x, k)`` for NaN-free float input.
    ``k`` must be a static int with ``k <= x.size``. (bf16 input is
    widened to f32 for the search -- exact, since the map is 1:1.)
    """
    n = x.shape[0]
    if k >= n:
        return jax.lax.top_k(x, k)
    y, bits = _ordered_uint(x)

    # Largest t with count(y >= t) >= k, by bisection on the u32 domain.
    # Invariant: count(y >= lo) >= k > count(y >= hi).
    utype = y.dtype.type

    def bisect_step(_, state):
        lo, hi = state
        mid = lo + (hi - lo) // utype(2)
        cnt = jnp.sum((y >= mid).astype(jnp.int32))
        take = cnt >= k
        return jnp.where(take, mid, lo), jnp.where(take, hi, mid)

    lo = jnp.zeros((), dtype=y.dtype)
    hi = ~lo  # all-ones
    # count(y >= 0) = n >= k always; handle the all-max corner where
    # count(y >= all-ones) >= k by one explicit check below.
    cnt_top = jnp.sum((y >= hi).astype(jnp.int32))
    lo, hi = jax.lax.fori_loop(0, bits, bisect_step, (lo, hi))
    t = jnp.where(cnt_top >= k, hi, lo)

    gt = y > t
    eq = y == t
    need_eq = k - jnp.sum(gt.astype(jnp.int32))
    # Stable selection: all strict winners + the first need_eq ties.
    eq_rank = jnp.cumsum(eq.astype(jnp.int32))
    mask = gt | (eq & (eq_rank <= need_eq))

    # Stable compaction into k slots (index order preserved).
    pos = jnp.cumsum(mask.astype(jnp.int32)) - 1
    pos = jnp.where(mask, pos, k)
    idx = (
        jnp.full((k,), n, dtype=jnp.int32)
        .at[pos]
        .set(jnp.arange(n, dtype=jnp.int32), mode="drop")
    )
    # Final lax.top_k ordering: values descending, ties by lowest index.
    # The compacted run is already index-ascending, so a stable sort on
    # descending value finishes the job (k elements -- cheap).
    ysel = y[idx]
    perm = jnp.argsort(~ysel, stable=True)
    idx = idx[perm]
    return x[idx], idx
