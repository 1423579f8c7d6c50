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


def _solve_prescaled(m, d, rhs, schulz_iters: int = 30,
                     refine_iters: int = 14):
    """Jacobi-prescaled solve of the SPD ``m``: a TRUNCATED Schulz
    (Newton) approximate inverse + Richardson refinement.

    Neither LU/Cholesky (O(k) SEQUENTIAL pivot steps -- several ms for a
    100 x 100 block inside the jitted step) nor CG (hundreds of
    latency-bound tiny matvecs, measured worse than LU) fit the TPU;
    Schulz iteration X <- X(2I - Ms X) is 2 MXU matmuls per step.

    Schulz is deliberately STOPPED EARLY: once an eigendirection has
    converged, every further Newton step SQUARES its (1 + delta)
    rounding factor -- at 48 iterations (cond ~ 2^21 after the eps
    floor) that amplification factor reaches e^(2^26 * delta) and the
    iteration was observed to diverge to NaN on TPU (bit-different CPU
    rounding survived). The floored spectrum needs ~log2(cond) ~ 21
    doublings, so 30 iterations leave only ~2^8 post-convergence
    squarings ((1+1e-7)^256 ~ 1 + 3e-5: harmless) while reaching
    contraction on the whole spectrum; the refinement loop -- a
    Richardson iteration with the FROZEN X, which cannot diverge while
    ||I - X M|| < 1 -- then takes the solution to f32 roundoff.
    Validated against an f64 oracle incl. near-singular Gram matrices
    (tests/test_sr_accuracy.py) and on the captured NaN-reproducing
    Li2O death state (/tmp-archived as a regression array set)."""
    ms = m * d[:, None] * d[None, :]
    k = ms.shape[0]
    eye = jnp.eye(k, dtype=ms.dtype)

    # TPU default matmul precision multiplies f32 operands in bf16; a
    # ~0.4%-error inverse makes the refinement loop DIVERGE whenever
    # cond * error > 1 (NaN params observed on the Li2O run). These are
    # k x k matmuls -- HIGHEST costs nothing here.
    def mm(a, b):
        return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)

    # Safe start: X0 = I / (||Ms||_1 ||Ms||_inf)^(1/2); Ms symmetric so
    # both norms equal the max row sum.
    t0 = 1.0 / jnp.maximum(jnp.max(jnp.sum(jnp.abs(ms), axis=1)), 1e-30)
    x = eye * t0

    # Monotone-residual acceptance: a Newton step is kept only if it
    # shrinks ||I - Ms X||_F; otherwise the iterate freezes at its best
    # value. Divergence (rounding factors (1+delta) squaring past the
    # convergence point -- observed as NaN on TPU at high cond, where
    # bit-different CPU rounding survived) is thereby impossible, at the
    # cost of one extra k x k matmul per step. Do NOT symmetrize the
    # iterate: averaging with X^T breaks Newton-Schulz self-correction
    # (also measured -- diverges within a few steps).
    def body(carry, _):
        x, r_norm = carry
        x2 = mm(x, 2.0 * eye - mm(ms, x))
        r2 = eye - mm(ms, x2)
        r2_norm = jnp.linalg.norm(r2)
        accept = jnp.isfinite(r2_norm) & (r2_norm < r_norm)
        return (
            jnp.where(accept, x2, x),
            jnp.where(accept, r2_norm, r_norm),
        ), None

    r0 = jnp.linalg.norm(eye - mm(ms, x))
    (x, _), _ = jax.lax.scan(
        body, (x, r0), None, length=schulz_iters
    )

    def solve(v):
        return d * mm(x, (d * v)[:, None])[:, 0]

    def refine(y, _):
        return y + solve(rhs - mm(m, y[:, None])[:, 0]), None

    y, _ = jax.lax.scan(refine, solve(rhs), None, length=refine_iters)
    return y


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
    hi = jax.lax.Precision.HIGHEST  # bf16 Gram error feeds the solve
    s_re = jnp.matmul(o_re, o_re.T, precision=hi) + jnp.matmul(
        o_im, o_im.T, precision=hi
    )
    s_im = jnp.matmul(o_im, o_re.T, precision=hi) - jnp.matmul(
        o_re, o_im.T, precision=hi
    )
    og_re = jnp.matmul(o_re, g, precision=hi)
    og_im = jnp.matmul(o_im, g, precision=hi)

    block = jnp.block([[s_re, -s_im], [s_im, s_re]])
    # Relative eps floors: 2^-20 bounds the f32 factorization's condition
    # number for the regularized branch; the pinv branch needs its cutoff
    # ABOVE the f32 Gram-assembly noise (~k * u_f32 * lambda_max ~
    # 6e-6 lambda_max at k = 50) or numerically-zero eigenvalues of a
    # rank-deficient Gram get AMPLIFIED instead of truncated -- 2^-14
    # plays the role of the reference's isclose-zero SVD cutoff at f32
    # precision (utils/misc.py:38-52).
    floor_exp = -20 if use_reg else -14
    floor = jnp.float32(2.0**floor_exp) * jnp.max(jnp.diag(block))
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
