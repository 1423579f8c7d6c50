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


def gumbel_top_k_sample(
    anqs: ANQS, params, key, sample_num: int, mesh=None
) -> GumbelSample:
    """Exactly the ``sample_num`` distinct most-probable-by-Gumbel states.

    The per-qudit ancestral loop is a ``lax.scan``: one traced network
    forward + top_k serves all qudit steps, keeping the compiled program
    size independent of qudit count (vs the reference's Python loop,
    abstract_anqs.py:690-776).

    With a ``mesh``, the frontier is sharded over the data axis: each
    device expands and scores its own prefix rows (the network forward is
    the dominant cost and parallelizes perfectly); the global top-k over
    Gumbel keys is the one collective per qudit step (SURVEY.md section 2
    "sampling parallelism"). GSPMD keeps semantics identical to the
    replicated run.
    """
    from ..parallel.mesh import shard_rows

    k_cap = sample_num
    d = anqs.max_dim
    words = jnp.zeros((k_cap, anqs.n_words), dtype=bitops.UINT)
    memo = jnp.full((k_cap,), anqs.start_memo_idx, dtype=jnp.int32)
    logp = jnp.full((k_cap,), NEG, dtype=jnp.float32).at[0].set(0.0)
    gumbel = jnp.full((k_cap,), NEG, dtype=jnp.float32).at[0].set(0.0)

    def body(carry, xs):
        words, memo, logp, gumbel = carry
        q, sub = xs
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
        child_gumbel = shard_rows(child_gumbel, mesh)

        top_g, top_idx = jax.lax.top_k(child_gumbel.reshape(-1), k_cap)
        parent = top_idx // d
        cont = (top_idx % d).astype(jnp.int32)
        words = _expand_words_dyn(anqs, words, parent, cont, q)
        memo = trans_q[memo[parent], cont]
        logp = child_logp.reshape(-1)[top_idx]
        return (words, memo, logp, top_g), None

    (words, memo, logp, gumbel), _ = jax.lax.scan(
        body,
        (words, memo, logp, gumbel),
        (
            jnp.arange(anqs.qudit_num, dtype=jnp.int32),
            jax.random.split(key, anqs.qudit_num),
        ),
    )

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
    anqs: ANQS, params, key, sample_num: int, budget: Optional[int] = None
) -> MultinomialSample:
    """Occupation-count sampling with capacity K = sample_num."""
    budget = int(budget if budget is not None else sample_num)
    if budget > (1 << 30):
        # int32 count/dropped accumulators; the f64 bisection itself is
        # exact to 2^53. 2^30 > the reference's largest exercised budget
        # (1e8, sandbox_qchem.py:54,135).
        raise ValueError("multinomial budget > 2^30 overflows int32 counts")
    return _multinomial_core(
        anqs, params, key, sample_num, jnp.asarray(budget, jnp.int32)
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


def _multinomial_core(anqs: ANQS, params, key, k_cap: int, budget):
    """multinomial_sample body with a (possibly traced) budget scalar.

    lax.scan over qudits, like ``gumbel_top_k_sample``."""
    d = anqs.max_dim
    k_bits = int(d).bit_length() - 1
    words = jnp.zeros((k_cap, anqs.n_words), dtype=bitops.UINT)
    memo = jnp.full((k_cap,), anqs.start_memo_idx, dtype=jnp.int32)
    counts = jnp.zeros((k_cap,), dtype=jnp.int32).at[0].set(budget)
    dropped = jnp.zeros((), dtype=jnp.int32)

    def body(carry, xs):
        words, memo, counts, dropped = carry
        q, sub = xs
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
        top_c, top_idx = jax.lax.top_k(child_counts, k_cap)
        dropped = dropped + (
            jnp.sum(child_counts) - jnp.sum(top_c)
        ).astype(jnp.int32)
        parent = top_idx // d
        cont = (top_idx % d).astype(jnp.int32)
        words = _expand_words_dyn(anqs, words, parent, cont, q)
        memo = trans_q[memo[parent], cont]
        return (words, memo, top_c, dropped), None

    (words, memo, counts, dropped), _ = jax.lax.scan(
        body,
        (words, memo, counts, dropped),
        (
            jnp.arange(anqs.qudit_num, dtype=jnp.int32),
            jax.random.split(key, anqs.qudit_num),
        ),
    )
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
            anqs, params, key, config.sample_num, mesh=mesh
        )
        weights = jnp.where(out.valid, jnp.exp(out.log_probs), 0.0)
        stats = {"unique_num": jnp.sum(out.valid), "dropped": 0}
        return out.words, weights, out.valid, stats
    if config.mode == "multinomial":
        if budget is None:
            out = multinomial_sample(
                anqs, params, key, config.sample_num, config.budget
            )
        else:
            out = _multinomial_core(
                anqs, params, key, config.sample_num,
                jnp.asarray(budget, jnp.int32),
            )
        total = jnp.maximum(jnp.sum(out.counts), 1)
        weights = out.counts.astype(jnp.float32) / total
        stats = {"unique_num": jnp.sum(out.valid), "dropped": out.dropped}
        return out.words, weights, out.valid, stats
    raise ValueError(config.mode)
