"""Regularized stochastic reconfiguration (MinSR) on top-k determinants.

Counterpart of the reference SR step (reference: nqs/nqs/applications/
quantum_chemistry/experiments/calculations/sr.py:88-137): centered per-sample
log-derivatives O over the top-k most probable sampled determinants, then the
sample-space Woodbury/MinSR solve

    grad <- eps^-1 g - O^dag (1 + eps O O^dag)^-1 O g.

TPU-native differences: per-sample jacobians come from one ``jax.vmap`` of
``jax.grad`` (the reference uses torch.autograd.functional.jacobian over a
functional_call, abstract_anqs.py:820-839); complex quantities are carried as
(re, im) float pairs since complex dtypes don't compile on TPU; the k x k
solve runs in float64 (k <= ~50, cost negligible).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree


@dataclasses.dataclass(frozen=True)
class SRConfig:
    max_indices_num: int = 25
    use_reg: bool = True
    reg_eps: float = 1e-4


def _per_sample_jacobians(anqs, params, words):
    """(k, P) jacobians of log|psi| and phase w.r.t. flattened params."""
    flat, unravel = ravel_pytree(params)

    def la_of(p_flat, w):
        la, _ = anqs.log_psi(unravel(p_flat), w[None])
        return la[0]

    def ph_of(p_flat, w):
        _, ph = anqs.log_psi(unravel(p_flat), w[None])
        return ph[0]

    j_la = jax.vmap(jax.grad(la_of), in_axes=(None, 0))(flat, words)
    j_ph = jax.vmap(jax.grad(ph_of), in_axes=(None, 0))(flat, words)
    return j_la, j_ph, flat, unravel


def sr_transform(
    anqs,
    params,
    grad_pytree,
    words,  # (B, W) sampled determinants
    weights,  # (B,) normalized frequencies (invalid rows weight 0)
    config: SRConfig = SRConfig(),
):
    """Apply the MinSR preconditioner to ``grad_pytree``. Returns a pytree.

    Top-k selection happens on-device with a static k, so the whole transform
    jits into the training step.
    """
    k = min(config.max_indices_num, words.shape[0])
    top_w, top_idx = jax.lax.top_k(weights, k)
    top_words = words[top_idx]
    f = top_w / jnp.maximum(jnp.sum(top_w), 1e-30)

    j_la, j_ph, g, unravel = _per_sample_jacobians(
        anqs, params, top_words
    )
    g = ravel_pytree(grad_pytree)[0]

    # Center: J <- J - sum_i f_i J_i (reference sr.py:119).
    j_la = j_la - jnp.sum(f[:, None] * j_la, axis=0, keepdims=True)
    j_ph = j_ph - jnp.sum(f[:, None] * j_ph, axis=0, keepdims=True)

    eps = config.reg_eps
    sqrt_f = jnp.sqrt(f)[:, None]
    # O = eps^-1 diag(sqrt f) conj(J), J = d log psi*/dtheta = J_la - i J_ph.
    o_re = sqrt_f * j_la / eps
    o_im = sqrt_f * j_ph / eps

    # T = O O^dag (Hermitian k x k), in float64 for the solve.
    t_re = (o_re @ o_re.T + o_im @ o_im.T).astype(jnp.float64)
    t_im = (o_im @ o_re.T - o_re @ o_im.T).astype(jnp.float64)

    og_re = (o_re @ g).astype(jnp.float64)
    og_im = (o_im @ g).astype(jnp.float64)

    if config.use_reg:
        m_re = jnp.eye(k, dtype=jnp.float64) + eps * t_re
        m_im = eps * t_im
    else:
        m_re, m_im = t_re, t_im
    # Solve (m_re + i m_im) y = og via the real 2k x 2k block system.
    block = jnp.block([[m_re, -m_im], [m_im, m_re]])
    rhs = jnp.concatenate([og_re, og_im])
    y = jnp.linalg.solve(block, rhs)
    y_re = y[:k].astype(jnp.float32)
    y_im = y[k:].astype(jnp.float32)

    if not config.use_reg:
        # Unregularized pseudo-inverse form S^+ g = O^dag (O O^dag)^-2 O g
        # (reference sr.py:129-134 via soft SVD inverse): solve once more.
        y2 = jnp.linalg.solve(
            block, jnp.concatenate([y[:k], y[k:]])
        )
        y_re = y2[:k].astype(jnp.float32)
        y_im = y2[k:].astype(jnp.float32)

    # O^dag y = (O_re^T - i O_im^T)(y_re + i y_im); real part only.
    ody_re = o_re.T @ y_re + o_im.T @ y_im
    if config.use_reg:
        new_flat = g / eps - ody_re
    else:
        new_flat = ody_re
    return unravel(new_flat)


def clip_grad_norm(grad_pytree, max_norm: float):
    """Global-norm clipping (reference process_grad.py:56-70)."""
    flat, unravel = ravel_pytree(grad_pytree)
    norm = jnp.linalg.norm(flat)
    scale = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-30))
    return unravel(flat * scale), norm
