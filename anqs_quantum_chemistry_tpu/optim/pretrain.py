"""Supervised amplitude pretraining: warm-start an ANQS from a known
wavefunction (e.g. the CISD vector).

The peaked-regime trap (round-2 C2H4 record: the transformer trains to
exactly HF and freezes; MADE extracts 28% of the correlation energy and
plateaus) is an *optimization* pathology: VMC starting near the HF peak
has vanishing gradients toward the correlated manifold. The CISD vector
is cheap classically (chem/fci.cisd_ground_state), its variational
energy already recovers ~90% of the correlation energy, and it is an
explicit list of (determinant, coefficient) pairs -- a perfect
supervised target. Minimizing the cross-entropy

    L = -sum_i p_i * 2 la_theta(x_i)   (+ phase MSE on the support)

over the CISD support (p_i = |c_i|^2 renormalized) drives the
structurally-normalized autoregressive distribution q_theta toward p
exactly (global optimum q = p on the support), after which VMC descends
from CISD quality instead of from the HF fixed point.

The reference has no pretraining facility -- this is a capability the
TPU rebuild adds on top of parity (it plays the role the second paper's
manual peaked-regime tricks play, but principled).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax


def amplitude_targets_from_coefs(coefs: np.ndarray):
    """(probs, phases) targets from real CI coefficients: Born weights
    renormalized over the support, phases 0/pi from the signs (global
    sign fixed so the largest-|c| determinant has phase 0)."""
    c = np.asarray(coefs, np.float64)
    c = c * np.sign(c[np.argmax(np.abs(c))] or 1.0)
    p = c * c
    p = p / p.sum()
    ph = np.where(c < 0.0, np.pi, 0.0)
    return p.astype(np.float32), ph.astype(np.float32)


def pretrain(
    anqs,
    params,
    words,  # (N, W) packed support determinants
    probs,  # (N,) target Born weights (sum 1)
    phases,  # (N,) target phases (0 / pi)
    key,
    iters: int = 1500,
    lr: float = 1e-3,
    batch: int = 8192,
    phase_weight: float = 1.0,
    log_every: int = 200,
    on_log=None,
    keep_best: bool = True,
):
    """Adam minimization of the cross-entropy + phase MSE; returns
    (params, history). ``words`` larger than ``batch`` are subsampled by
    probability each step (an unbiased estimator of the full loss).

    ``keep_best`` tracks the lowest-loss parameters on device and
    returns those instead of the final ones: Adam occasionally diverges
    mid-distillation on peaked targets (observed on the H2O transformer:
    CE 0.188 -> 0.428 at step ~2000, never recovering -- the broken
    warm start then collapses the whole VMC run to HF), and rollback
    makes the warm start robust to it. With minibatched targets the
    per-step loss is a noisy estimate, so "best" is approximate there;
    on full-batch supports (n <= batch) it is exact. NaN losses never
    replace the snapshot (NaN < x is False)."""
    n = words.shape[0]
    words = jnp.asarray(words)
    probs_j = jnp.asarray(probs)
    phases_j = jnp.asarray(phases)
    opt = optax.adam(lr)
    opt_state = opt.init(params)
    full = n <= batch

    def loss_fn(p, w, tp, tph, wgt):
        la, ph = anqs.log_psi(p, w)
        ce = -2.0 * jnp.sum(wgt * tp * la)
        dph = ph - tph
        pml = jnp.sum(wgt * tp * dph * dph)
        return ce + phase_weight * pml, (ce, pml)

    @jax.jit
    def step(p, o, k, best_l, best_p):
        if full:
            w, tp, tph = words, probs_j, phases_j
            wgt = jnp.ones_like(tp)
        else:
            k, sub = jax.random.split(k)
            idx = jax.random.choice(
                sub, n, shape=(batch,), p=probs_j, replace=True
            )
            w, tph = words[idx], phases_j[idx]
            # Importance-sampled: each drawn det contributes 1/batch of
            # the p-weighted sum.
            tp = jnp.ones((batch,), jnp.float32)
            wgt = jnp.full((batch,), 1.0 / batch, jnp.float32)
        (l, (ce, pml)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(p, w, tp, tph, wgt)
        # Snapshot the pre-update params that PRODUCED loss l (cheap
        # on-device selects; no host sync).
        better = l < best_l
        best_l = jnp.where(better, l, best_l)
        best_p = jax.tree.map(
            lambda a, b: jnp.where(better, a, b), p, best_p
        )
        updates, o = opt.update(grads, o, p)
        p = optax.apply_updates(p, updates)
        return p, o, k, l, ce, pml, best_l, best_p

    best_l = jnp.asarray(jnp.inf, jnp.float32)
    best_p = params
    history = []
    for it in range(iters):
        params, opt_state, key, l, ce, pml, best_l, best_p = step(
            params, opt_state, key, best_l, best_p
        )
        if it % log_every == 0 or it == iters - 1:
            row = {
                "iter": it,
                "loss": float(l),
                "cross_entropy": float(ce),
                "phase_mse": float(pml),
                "best_loss": float(best_l),
            }
            history.append(row)
            if on_log is not None:
                on_log(row)
    return (best_p if keep_best else params), history


def pack_dets(dets, qubit_num: int):
    """Python-int determinants -> packed (N, W) uint32 words."""
    from ..ops import bits as bitops

    bits = np.zeros((len(dets), qubit_num), dtype=np.int64)
    for i, d in enumerate(dets):
        d = int(d)
        for q in range(qubit_num):
            bits[i, q] = (d >> q) & 1
    return bitops.pack(jnp.asarray(bits))
