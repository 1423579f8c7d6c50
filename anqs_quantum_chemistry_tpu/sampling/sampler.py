"""Fixed-capacity ancestral samplers: exact Gumbel top-k and multinomial.

TPU-native redesign of the reference's dynamic-frontier samplers
(reference: nqs/nqs/stochastic/ansatzes/anqs/abstract_anqs.py:494-818):
instead of data-dependent frontier tensors, a capacity-K frontier (K =
sample_num) advances one qudit per step under jit with static shapes; invalid
rows ride along with NEG log-probabilities / zero counts.

* ``gumbel_top_k_sample``: exact top-K unique determinants by propagating
  conditional Gumbel maxima (the reference's sample_indices_gumbel,
  abstract_anqs.py:676-818). Keeping the global top-K each step is exact --
  the reference truncates identically.
* ``multinomial_sample``: exact batch-multinomial occupation counts by
  binomial bisection of the masked softmax (reference sample_mult_new_new,
  abstract_anqs.py:557-591). Exact whenever the sampling budget <= K (counts
  can spread over at most ``budget`` rows); with larger budgets the lowest-
  count tail is dropped and reported as ``dropped``.

Symmetry projection happens *during* sampling via the masker's per-qudit
transition/mask tables -- every emitted determinant is physical.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..models.anqs import ANQS, NEG
from ..ops import bits as bitops


class SamplerState(NamedTuple):
    words: jnp.ndarray  # (K, W) uint32
    memo: jnp.ndarray  # (K,) int32


class GumbelSample(NamedTuple):
    words: jnp.ndarray  # (K, W)
    log_probs: jnp.ndarray  # (K,) renormalized over the returned set
    valid: jnp.ndarray  # (K,) bool


class MultinomialSample(NamedTuple):
    words: jnp.ndarray  # (K, W)
    counts: jnp.ndarray  # (K,) int32
    valid: jnp.ndarray  # (K,) bool
    dropped: jnp.ndarray  # () int32: counts lost to capacity truncation


def _log1mexp(x):
    """log(1 - exp(x)) for x <= 0, stable at both ends."""
    return jnp.where(
        x > -0.693,
        jnp.log(-jnp.expm1(jnp.minimum(x, -1e-20))),
        jnp.log1p(-jnp.exp(x)),
    )


def _log1pexp(x):
    return jnp.where(
        x < 18.0,
        jnp.log1p(jnp.exp(jnp.minimum(x, 18.0))),
        x + jnp.exp(-jnp.maximum(x, 18.0)),
    )


def _gumbels_given_max(key, centers, maxes):
    """Children Gumbels conditioned on their max being ``maxes``.

    centers (K, D) = children log-probs; maxes (K,) = parent Gumbel.
    (Kool et al. stochastic beams; reference sample_gumbels_given_max,
    abstract_anqs.py:676-688.)
    """
    u = jax.random.uniform(
        key, centers.shape, dtype=centers.dtype, minval=1e-38, maxval=1.0
    )
    g = centers - jnp.log(-jnp.log(u))
    observed = jnp.max(g, axis=-1, keepdims=True)
    v = maxes[:, None] - g + _log1mexp(g - observed)
    cond = maxes[:, None] - jnp.maximum(v, 0.0) - _log1pexp(-jnp.abs(v))
    return jnp.maximum(jnp.nan_to_num(cond, nan=NEG, neginf=NEG), NEG)


def _expand_words_dyn(anqs: ANQS, words, parent_idx, cont, q):
    """Advance the frontier words: copy parents, write the continuation into
    the (traced) qudit bit range."""
    new_words = words[parent_idx]
    start = jnp.take(anqs.qudit_starts_arr, q)
    return bitops.set_bit_range_dyn(new_words, start, anqs.max_width, cont)


def _frontier_saturation_step(anqs: ANQS, k_cap: int) -> int:
    """First qudit step whose INCOMING frontier already holds ``k_cap``
    rows. The frontier entering step q has at most prod(2**width_j,
    j < q) distinct prefixes, so steps before the saturation point run
    unrolled on exactly-sized small arrays and only the saturated tail
    runs the full (k_cap, D) expansion inside one lax.scan. At qpq=10 /
    16k samples this cuts the dominant last-step top_k from 16.7M to 1M
    candidates (the round-2 all-scan sampler paid the full expansion at
    every step)."""
    c = 1
    for q in range(anqs.qudit_num):
        if c >= k_cap:
            return q
        c *= 1 << int(anqs.qudit_widths[q])
    return anqs.qudit_num


def _select_top_k(x, k: int, impl: str):
    """Selection primitive: 'lax' (XLA TopK) or 'bisect'
    (ops.topk.exact_top_k -- value-domain bisection, bit-identical
    output; see tools/bench_topk.py for the on-device comparison)."""
    if impl == "bisect":
        from ..ops.topk import exact_top_k

        return exact_top_k(x, k)
    return jax.lax.top_k(x, k)


def gumbel_top_k_sample(
    anqs: ANQS, params, key, sample_num: int, mesh=None,
    topk_impl: str = "lax",
) -> GumbelSample:
    """Exactly the ``sample_num`` distinct most-probable-by-Gumbel states.

    Capacity-scheduled ancestral loop: the first steps (frontier smaller
    than ``sample_num``) are unrolled with exact static shapes; the
    remaining full-capacity steps run in one ``lax.scan`` (one traced
    network forward + top_k serving all of them, keeping compile time
    bounded -- vs the reference's per-qudit Python loop,
    abstract_anqs.py:690-776).

    With a ``mesh``, the full-capacity frontier is sharded over the data
    axis: each device expands and scores its own prefix rows (the network
    forward is the dominant cost and parallelizes perfectly); the global
    top-k over Gumbel keys is the one collective per qudit step
    (SURVEY.md section 2 "sampling parallelism"). The unrolled prefix
    stays replicated (its arrays are tiny). GSPMD keeps semantics
    identical to the replicated run.
    """
    from ..parallel.mesh import shard_rows

    k_cap = sample_num
    d = anqs.max_dim
    q_num = anqs.qudit_num
    subkeys = jax.random.split(key, q_num)

    def step(carry, q, sub, k_out, shard):
        words, memo, logp, gumbel = carry
        if shard:
            words, memo, logp, gumbel = shard_rows(
                (words, memo, logp, gumbel), mesh
            )
        mask_q = jnp.take(anqs.mask_tables, q, axis=0)  # (S, D)
        trans_q = jnp.take(anqs.trans_tables, q, axis=0)  # (S, D)
        alive = logp > 0.5 * NEG
        cond = anqs.cond_for_qudit_dyn(
            params, words, q, mask_q[memo], alive=alive
        )
        child_logp = jnp.maximum(logp[:, None] + 2.0 * cond, NEG)
        child_gumbel = _gumbels_given_max(sub, child_logp, gumbel)
        child_gumbel = jnp.where(child_logp > 0.5 * NEG, child_gumbel, NEG)
        if shard:
            child_gumbel = shard_rows(child_gumbel, mesh)

        top_g, top_idx = _select_top_k(
            child_gumbel.reshape(-1), k_out, topk_impl
        )
        parent = top_idx // d
        cont = (top_idx % d).astype(jnp.int32)
        words = _expand_words_dyn(anqs, words, parent, cont, q)
        memo = trans_q[memo[parent], cont]
        logp = child_logp.reshape(-1)[top_idx]
        return (words, memo, logp, top_g)

    q_sat = _frontier_saturation_step(anqs, k_cap)
    carry = (
        jnp.zeros((1, anqs.n_words), dtype=bitops.UINT),
        jnp.full((1,), anqs.start_memo_idx, dtype=jnp.int32),
        jnp.zeros((1,), dtype=jnp.float32),
        jnp.zeros((1,), dtype=jnp.float32),
    )
    cap_now = 1
    for q in range(q_sat):
        cap_now = min(
            cap_now * (1 << int(anqs.qudit_widths[q])), k_cap
        )
        carry = step(carry, q, subkeys[q], cap_now, shard=False)

    if cap_now < k_cap:
        # Whole space smaller than k_cap: pad to the fixed return shape.
        pad = k_cap - cap_now
        words, memo, logp, gumbel = carry
        carry = (
            jnp.concatenate(
                [words, jnp.zeros((pad, anqs.n_words), bitops.UINT)]
            ),
            jnp.concatenate(
                [memo, jnp.full((pad,), anqs.start_memo_idx, jnp.int32)]
            ),
            jnp.concatenate([logp, jnp.full((pad,), NEG, jnp.float32)]),
            jnp.concatenate([gumbel, jnp.full((pad,), NEG, jnp.float32)]),
        )

    if q_sat < q_num:
        def body(c, xs):
            q, sub = xs
            return step(c, q, sub, k_cap, shard=True), None

        carry, _ = jax.lax.scan(
            body,
            carry,
            (
                jnp.arange(q_sat, q_num, dtype=jnp.int32),
                subkeys[q_sat:],
            ),
        )

    words, memo, logp, gumbel = carry
    valid = logp > 0.5 * NEG
    norm = jax.nn.logsumexp(jnp.where(valid, logp, NEG))
    log_probs = jnp.where(valid, logp - norm, NEG)
    return GumbelSample(words=words, log_probs=log_probs, valid=valid)


def _binomial_bisect(key, counts, probs, k_bits: int):
    """Split integer ``counts`` (K,) over D=2**k_bits slots ~ multinomial.

    Counts ride in float64 so integer draws stay exact up to 2^53 --
    this is what admits the reference's 1e8-sample budgets
    (reference: nqs/nqs/sandbox_qchem.py:54,135); the old float32 carrier
    capped exactness at 2^24."""
    k_cap = counts.shape[0]
    counts_l = counts[:, None].astype(jnp.float64)  # (K, 1)
    blocks = probs[:, None, :]  # (K, blocks, block_size)
    for level in range(k_bits):
        key, sub = jax.random.split(key)
        half = blocks.shape[-1] // 2
        left, right = blocks[..., :half], blocks[..., half:]
        pl = jnp.sum(left, axis=-1)
        pr = jnp.sum(right, axis=-1)
        ratio = jnp.nan_to_num(pl / jnp.maximum(pl + pr, 1e-38), nan=0.0)
        # Deterministic splits (p = 0 or 1) bypass the binomial sampler:
        # jax.random.binomial mishandles the p == 1 edge (counts vanish).
        safe_ratio = jnp.clip(ratio, 1e-7, 1.0 - 1e-7).astype(jnp.float64)
        n_left = jax.random.binomial(
            sub, counts_l, safe_ratio, dtype=jnp.float64
        )
        n_left = jnp.nan_to_num(n_left, nan=0.0)
        n_left = jnp.where(ratio >= 1.0 - 1e-9, counts_l, n_left)
        n_left = jnp.where(ratio <= 1e-9, 0.0, n_left)
        n_left = jnp.where(counts_l > 0, n_left, 0.0)
        counts_l = jnp.stack([n_left, counts_l - n_left], axis=-1).reshape(
            k_cap, -1
        )
        blocks = jnp.stack([left, right], axis=2).reshape(
            k_cap, -1, half
        )
    return counts_l.astype(jnp.int32)  # (K, D)


def multinomial_sample(
    anqs: ANQS, params, key, sample_num: int, budget: Optional[int] = None,
    topk_impl: str = "lax",
) -> MultinomialSample:
    """Occupation-count sampling with capacity K = sample_num."""
    budget = int(budget if budget is not None else sample_num)
    if budget > (1 << 30):
        # int32 count/dropped accumulators; the f64 bisection itself is
        # exact to 2^53. 2^30 > the reference's largest exercised budget
        # (1e8, sandbox_qchem.py:54,135).
        raise ValueError("multinomial budget > 2^30 overflows int32 counts")
    return _multinomial_core(
        anqs, params, key, sample_num, jnp.asarray(budget, jnp.int32),
        topk_impl=topk_impl,
    )


def sample_precisely(
    anqs: ANQS,
    params,
    key,
    sample_num: int,
    target_unique: int,
    max_budget: int = 1 << 27,
    growth: float = 4.0,
):
    """Adaptive multinomial budget: rescale until >= target unique states.

    Counterpart of the reference's ``sample_precisely`` loop
    (reference: .../calculations/sample.py:62-75): the budget enters the
    jitted sampler as a traced scalar, so every retry reuses one compiled
    program. Returns (MultinomialSample, final_budget).
    """
    budget = sample_num

    # The budget enters as a traced scalar so all retries share one program.
    run = jax.jit(lambda p, k, b: _multinomial_core(anqs, p, k, sample_num, b))

    while True:
        key, sub = jax.random.split(key)
        out = run(params, sub, jnp.asarray(budget, jnp.int32))
        n_unique = int(jnp.sum(out.valid))
        if n_unique >= min(target_unique, sample_num) or budget >= max_budget:
            return out, budget
        budget = min(int(budget * growth), max_budget)


def _multinomial_core(
    anqs: ANQS, params, key, k_cap: int, budget, topk_impl: str = "lax"
):
    """multinomial_sample body with a (possibly traced) budget scalar.

    Capacity-scheduled like ``gumbel_top_k_sample``: unrolled exact-shape
    steps until the frontier saturates at ``k_cap``, then one lax.scan
    over the remaining qudits."""
    d = anqs.max_dim
    q_num = anqs.qudit_num
    k_bits = int(d).bit_length() - 1
    subkeys = jax.random.split(key, q_num)

    def step(carry, q, sub, k_out):
        words, memo, counts, dropped = carry
        mask_q = jnp.take(anqs.mask_tables, q, axis=0)
        trans_q = jnp.take(anqs.trans_tables, q, axis=0)
        alive = counts > 0
        cond = anqs.cond_for_qudit_dyn(
            params, words, q, mask_q[memo], alive=alive
        )
        probs = jnp.where(
            cond > 0.5 * NEG,
            jnp.exp(2.0 * jnp.maximum(cond, -40.0)),
            0.0,
        )
        child_counts = _binomial_bisect(sub, counts, probs, k_bits)
        child_counts = jnp.where(
            counts[:, None] > 0, child_counts, 0
        ).reshape(-1)
        top_c, top_idx = _select_top_k(child_counts, k_out, topk_impl)
        dropped = dropped + (
            jnp.sum(child_counts) - jnp.sum(top_c)
        ).astype(jnp.int32)
        parent = top_idx // d
        cont = (top_idx % d).astype(jnp.int32)
        words = _expand_words_dyn(anqs, words, parent, cont, q)
        memo = trans_q[memo[parent], cont]
        return (words, memo, top_c, dropped)

    q_sat = _frontier_saturation_step(anqs, k_cap)
    carry = (
        jnp.zeros((1, anqs.n_words), dtype=bitops.UINT),
        jnp.full((1,), anqs.start_memo_idx, dtype=jnp.int32),
        jnp.zeros((1,), dtype=jnp.int32).at[0].set(budget),
        jnp.zeros((), dtype=jnp.int32),
    )
    cap_now = 1
    for q in range(q_sat):
        cap_now = min(
            cap_now * (1 << int(anqs.qudit_widths[q])), k_cap
        )
        carry = step(carry, q, subkeys[q], cap_now)

    if cap_now < k_cap:
        pad = k_cap - cap_now
        words, memo, counts, dropped = carry
        carry = (
            jnp.concatenate(
                [words, jnp.zeros((pad, anqs.n_words), bitops.UINT)]
            ),
            jnp.concatenate(
                [memo, jnp.full((pad,), anqs.start_memo_idx, jnp.int32)]
            ),
            jnp.concatenate([counts, jnp.zeros((pad,), jnp.int32)]),
            dropped,
        )

    if q_sat < q_num:
        def body(c, xs):
            q, sub = xs
            return step(c, q, sub, k_cap), None

        carry, _ = jax.lax.scan(
            body,
            carry,
            (
                jnp.arange(q_sat, q_num, dtype=jnp.int32),
                subkeys[q_sat:],
            ),
        )

    words, memo, counts, dropped = carry
    return MultinomialSample(
        words=words, counts=counts, valid=counts > 0, dropped=dropped
    )


@dataclasses.dataclass(frozen=True)
class SamplingConfig:
    """Counterpart of the reference SamplingConfig
    (reference: .../experiments/calculations/sample.py:8-50)."""

    sample_num: int = 10000
    mode: str = "gumbel"  # 'gumbel' (unique top-k) | 'multinomial'
    budget: Optional[int] = None  # multinomial budget (defaults sample_num)
    topk_impl: str = "lax"  # 'lax' | 'bisect' (ops.topk.exact_top_k)


def sample(
    anqs: ANQS, params, key, config: SamplingConfig, mesh=None,
    budget=None,
):
    """Unified entry: returns (words, weights, valid, stats dict).

    ``weights`` are normalized frequencies: theoretical |psi|^2 renorm for
    gumbel mode, empirical counts/budget for multinomial mode. ``mesh``
    shards the gumbel frontier over the data axis (see gumbel_top_k_sample).
    ``budget`` (a possibly-traced int32 scalar) overrides the multinomial
    budget -- the hook for adaptive sample_precisely without recompiles.
    """
    if config.mode == "gumbel":
        out = gumbel_top_k_sample(
            anqs, params, key, config.sample_num, mesh=mesh,
            topk_impl=config.topk_impl,
        )
        weights = jnp.where(out.valid, jnp.exp(out.log_probs), 0.0)
        stats = {"unique_num": jnp.sum(out.valid), "dropped": 0}
        return out.words, weights, out.valid, stats
    if config.mode == "multinomial":
        if budget is None:
            out = multinomial_sample(
                anqs, params, key, config.sample_num, config.budget,
                topk_impl=config.topk_impl,
            )
        else:
            out = _multinomial_core(
                anqs, params, key, config.sample_num,
                jnp.asarray(budget, jnp.int32),
                topk_impl=config.topk_impl,
            )
        total = jnp.maximum(jnp.sum(out.counts), 1)
        weights = out.counts.astype(jnp.float32) / total
        stats = {"unique_num": jnp.sum(out.valid), "dropped": out.dropped}
        return out.words, weights, out.valid, stats
    raise ValueError(config.mode)
