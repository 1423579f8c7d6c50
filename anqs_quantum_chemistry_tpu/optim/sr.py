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
    """(k, P) jacobians of log|psi| and phase w.r.t. flattened params.

    One vjp per row with two pullbacks (la and ph cotangents) shares the
    forward pass between the two jacobians."""
    flat, unravel = ravel_pytree(params)
    one = jnp.ones((), jnp.float32)
    zero = jnp.zeros((), jnp.float32)

    def row(w):
        def both(p_flat):
            la, ph = anqs.log_psi(unravel(p_flat), w[None])
            return la[0], ph[0]

        _, pull = jax.vjp(both, flat)
        (j_la,) = pull((one, zero))
        (j_ph,) = pull((zero, one))
        return j_la, j_ph

    j_la, j_ph = jax.vmap(row)(words)
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

    sqrt_f = jnp.sqrt(f)[:, None]
    # Natural scaling (no eps^-1 inside O): with O' = diag(sqrt f) conj(J),
    # MinSR reads grad <- eps^-1 [g - O'^dag (eps I + O' O'^dag)^-1 O' g],
    # algebraically identical to the reference form (sr.py:121-128).
    o_re = sqrt_f * j_la
    o_im = sqrt_f * j_ph
    new_flat = minsr_precondition(
        o_re, o_im, g, config.reg_eps, config.use_reg
    )
    return unravel(new_flat)


def _solve_prescaled(m, d, rhs, cg_iters: int = 100):
    """Jacobi-prescaled solve of the SPD ``m`` by fixed-iteration
    conjugate gradients plus one iterative-refinement step.

    CG instead of LU because TPU LU/Cholesky factorizations of even a
    100 x 100 block are SEQUENTIAL (O(k) dependent pivot steps -- several
    ms inside the jitted train step), while CG is pure fused vector work
    (matvec + dots per iteration, ~microseconds each under jit). With the
    Jacobi prescaling the spectrum is tight and 100 iterations reach f32
    roundoff on every case in the accuracy suite
    (tests/test_sr_accuracy.py, incl. near-singular Gram matrices)."""
    ms = m * d[:, None] * d[None, :]

    def cg(b):
        def body(carry, _):
            x, r, p, rs = carry
            mp = ms @ p
            alpha = rs / jnp.maximum(p @ mp, 1e-30)
            x = x + alpha * p
            r = r - alpha * mp
            rs_new = r @ r
            p = r + (rs_new / jnp.maximum(rs, 1e-30)) * p
            return (x, r, p, rs_new), None

        x0 = jnp.zeros_like(b)
        (x, _, _, _), _ = jax.lax.scan(
            body, (x0, b, b, b @ b), None, length=cg_iters
        )
        return x

    def solve(v):
        return d * cg(d * v)

    x = solve(rhs)
    return x + solve(rhs - m @ x)


def minsr_precondition(o_re, o_im, g, eps, use_reg: bool = True):
    """The MinSR sample-space solve on an explicit (k, P) O-matrix.

    use_reg=True (reference sr.py:121-128):
        grad <- eps^-1 [g - O^dag (eps I + O O^dag)^-1 O g].
    use_reg=False (reference sr.py:129-135 + utils/misc.py:45-52, the
    SVD-pseudo-inverse variant):
        grad <- O^dag pinv(T)^2 O g  =  (O^dag O)^+ g,  T = O O^dag,
    realized here as a twice-applied small-ridge solve (lambda /
    (lambda + reg)^2 -> truncates near-zero eigenvalues exactly like the
    reference's soft SVD cutoff, without an SVD -- f64 linalg and f32
    eigh/SVD do not compile through this TPU toolchain).

    The Hermitian k x k system is embedded as a real-symmetric 2k x 2k
    block and solved by Jacobi-prescaled f32 LU with one iterative-
    refinement step; ``eps`` gets a relative floor of 2^-20 * max diag(S)
    so the f32 factorization's condition number stays <= ~1e6 even for
    adversarial (near-singular) Gram matrices (accuracy envelope
    validated against an f64 oracle in tests/test_sr_accuracy.py).
    """
    k = o_re.shape[0]
    s_re = o_re @ o_re.T + o_im @ o_im.T
    s_im = o_im @ o_re.T - o_re @ o_im.T
    og_re = o_re @ g
    og_im = o_im @ g

    block = jnp.block([[s_re, -s_im], [s_im, s_re]])
    floor = jnp.float32(2.0**-20) * jnp.max(jnp.diag(block))
    reg = jnp.maximum(
        jnp.float32(eps) if use_reg else jnp.float32(0.0), floor
    )
    m = block + reg * jnp.eye(2 * k, dtype=jnp.float32)
    d = jax.lax.rsqrt(jnp.maximum(jnp.diag(m), 1e-30))
    rhs = jnp.concatenate([og_re, og_im])
    y = _solve_prescaled(m, d, rhs)
    if not use_reg:
        # Second application: (S + reg)^-2 ~= pinv(S)^2 on the retained
        # spectrum, with near-zero eigenvalues damped to zero.
        y = _solve_prescaled(m, d, y)
    y_re, y_im = y[:k], y[k:]

    # O^dag y = (O_re^T - i O_im^T)(y_re + i y_im); real part only.
    ody_re = o_re.T @ y_re + o_im.T @ y_im
    if use_reg:
        # Divide by the EFFECTIVE regularizer (floor included): the MinSR
        # identity needs the same eps in the solve and the prefactor.
        return (g - ody_re) / reg
    return ody_re


def clip_grad_norm(grad_pytree, max_norm: float):
    """Global-norm clipping (reference process_grad.py:56-70)."""
    flat, unravel = ravel_pytree(grad_pytree)
    norm = jnp.linalg.norm(flat)
    scale = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-30))
    return unravel(flat * scale), norm
