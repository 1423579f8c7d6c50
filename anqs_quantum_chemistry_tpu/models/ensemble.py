"""Multi-head ansatz ensembles via ``vmap`` over a heads axis.

The reference implements ensembles with a hand-rolled batched Linear
(``MultiHeadLinear`` via bmm, multi_head_linear.py:6-31) and a multi-head
MLP carrying a head dimension through every layer (multi_head_mlp.py:11-207).
The TPU-native equivalent needs no new modules at all: stack H independent
parameter pytrees and ``vmap`` the existing ANQS forward over them -- XLA
batches the per-head matmuls exactly like bmm, and every ANQS variant
(MADE/NADE/transformer, any head mode) becomes ensemble-capable for free.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ensemble_init(anqs, key, n_heads: int):
    """Stacked parameters: every leaf gains a leading (n_heads,) axis."""
    keys = jax.random.split(key, n_heads)
    return jax.vmap(anqs.init)(keys)


def ensemble_log_psi(anqs, stacked_params, words):
    """(H-stacked params, (B, W) words) -> (log_abs (H, B), phase (H, B))."""
    return jax.vmap(anqs.log_psi, in_axes=(0, None))(stacked_params, words)


def ensemble_mean_energy(e_heads, weights=None):
    """Average per-head energies (uniform or given weights) -- the
    reference uses head ensembles for variance reduction/averaging."""
    e = jnp.asarray(e_heads)
    if weights is None:
        return jnp.mean(e, axis=0)
    w = jnp.asarray(weights)
    return jnp.sum(w[:, None] * e, axis=0) / jnp.sum(w)
