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
    # Natural scaling (no eps^-1 inside O): with O' = diag(sqrt f) conj(J),
    # MinSR reads grad <- eps^-1 [g - O'^dag (eps I + O' O'^dag)^-1 O' g],
    # algebraically identical to the reference form (sr.py:121-128). The
    # tiny Hermitian S = O' O'^dag is solved by Jacobi-prescaled f32 LU
    # below (f64 linear algebra does not compile on this TPU toolchain:
    # "Only F32 and C64 implemented in LuDecomposition").
    o_re = sqrt_f * j_la
    o_im = sqrt_f * j_ph

    s_re = o_re @ o_re.T + o_im @ o_im.T
    s_im = o_im @ o_re.T - o_re @ o_im.T
    og_re = o_re @ g
    og_im = o_im @ g

    # Real symmetric 2k x 2k embedding of the Hermitian S, solved by f32 LU
    # with Jacobi pre-scaling (f64 linalg and f32 eigh are unusable through
    # this TPU toolchain: f64 LU unimplemented, eigh expansion compiles for
    # >10 minutes). Pre-scaling keeps the condition number manageable for
    # the f32 factorization.
    block = jnp.block([[s_re, -s_im], [s_im, s_re]])
    reg = eps if config.use_reg else 1e-6 * jnp.max(jnp.diag(block))
    m = block + reg * jnp.eye(2 * k, dtype=jnp.float32)
    d = jax.lax.rsqrt(jnp.maximum(jnp.diag(m), 1e-30))
    m_scaled = m * d[:, None] * d[None, :]
    rhs = jnp.concatenate([og_re, og_im])
    y = d * jnp.linalg.solve(m_scaled, d * rhs)
    y_re, y_im = y[:k], y[k:]

    # O'^dag y = (O_re^T - i O_im^T)(y_re + i y_im); real part only.
    ody_re = o_re.T @ y_re + o_im.T @ y_im
    if config.use_reg:
        new_flat = (g - ody_re) / eps
    else:
        new_flat = ody_re
    return unravel(new_flat)


def clip_grad_norm(grad_pytree, max_norm: float):
    """Global-norm clipping (reference process_grad.py:56-70)."""
    flat, unravel = ravel_pytree(grad_pytree)
    norm = jnp.linalg.norm(flat)
    scale = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-30))
    return unravel(flat * scale), norm
