"""Support-CI closure: the reusable enrich -> distill -> polish pipeline.

Proven on Li2O (docs/DESIGN_NOTES.md "Li2O CLOSED"): an ANQS trained by
top-k-sampled VMC is the near-exact ground state of H restricted to its
own proposable support, and the remaining energy lives in determinants
it assigns ~zero probability. The oracle-free closure:

1. enrich: selected-CI expansion of a seed support (the state's own
   sample, a CISD support, ...) on the host (chem/selected_ci.py) --
   unscreened for small orbital counts, heat-bath-screened beyond.
2. distill: minibatched CE pretraining onto the enriched vector
   (optim/pretrain.py) -- fast mass placement.
3. polish: full-support deterministic fit (chunked under
   jax.checkpoint) of CE + tempered offset-free log-profile regression
   + phase MSE + a LINEAR on-support-mass penalty (quadratic saturates;
   the leak's junk determinants sit ~Ha high, so sub-0.01% leak mass is
   required for sub-mHa energies).
4. measure: the sampled full-energy estimator (every connected
   amplitude of a fresh Gumbel sample through the network), the same
   protocol as all ladder artifacts.

No reference counterpart (the reference never leaves plain VMC); this
is the TPU rebuild's answer to top-k support truncation at >25 qubits.
"""

from __future__ import annotations

import os
import time
from typing import Callable, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..optim.pretrain import (
    amplitude_targets_from_coefs,
    pack_dets,
    pretrain,
)
from ..ops import keys as keyops
from ..sampling.sampler import gumbel_top_k_sample


def sample_support(vmc, params, key, sample_num: int, passes: int = 3):
    """Union of determinants over ``passes`` Gumbel top-k samples."""
    from ..ops import bits as bitops

    n = vmc.ham.qubit_num
    out = set()
    samp = jax.jit(
        lambda p, k: gumbel_top_k_sample(vmc.anqs, p, k, sample_num)
    )
    for _ in range(passes):
        key, sub = jax.random.split(key)
        s = samp(params, sub)
        w = np.asarray(s.words)[np.asarray(s.valid)]
        bits = np.asarray(bitops.unpack(jnp.asarray(w), n))
        out.update(
            int(x) for x in
            (bits.astype(np.uint64)
             << np.arange(n, dtype=np.uint64)[None]).sum(1)
        )
    return sorted(out), key


def make_target(dets: Sequence[int], coef: np.ndarray, qubit_num: int):
    """Device arrays for the distill/polish losses."""
    probs, phases = amplitude_targets_from_coefs(coef)
    words = pack_dets(dets, qubit_num)
    p_t = jnp.asarray(probs)
    return {
        "dets": [int(x) for x in dets],
        "words": words,
        "p": p_t,
        # 1e-38 is denormal in f32 and XLA flushes it to zero
        # (log -> -inf); clamp at a normal float.
        "la": 0.5 * jnp.log(jnp.maximum(p_t, 1e-30)),
        "ph": jnp.asarray(phases),
    }


def distill(anqs, params, target, key, stages, batch: int = 8192,
            on_log=None):
    """Minibatched CE distillation (optim/pretrain) over LR stages."""
    for iters, lr in stages:
        params, _ = pretrain(
            anqs, params, target["words"],
            np.asarray(target["p"]), np.asarray(target["ph"]),
            key, iters=iters, lr=lr, batch=batch, on_log=on_log,
        )
    return params


def polish(anqs, params, target, *, temp: float = 2.0, lam: float = 30.0,
           kind: str = "lin", lrs=(1e-4, 3e-5, 1e-5, 3e-6),
           steps: int = 2000, window: int = 200, chunk: int = 16384,
           on_stage: Optional[Callable] = None,
           accept_fn: Optional[Callable] = None):
    """Full-support deterministic fit with the linear mass penalty.

    Every loss term is a linear sum of per-row quantities (the
    offset-free regression expands to global moments), so the support
    reduces chunk by chunk under lax.map + jax.checkpoint (peak HBM =
    one chunk). The optimizer scan is windowed: single device dispatches
    over ~60-120 s kill the TPU worker (CLAUDE.md).

    ``accept_fn(params) -> float`` is the ENERGY-acceptance guard
    (round-3 C2H4 lesson: the polish loss decreased monotonically while
    the sampled energy rose 290 mHa -- the regression terms are not
    aligned with the Rayleigh quotient at 52q). When given, each LR
    stage's result is measured; a stage whose energy is worse than the
    best measured so far is ROLLED BACK (the next stage restarts from
    the best accepted params), and the returned params are the best
    accepted ones. A destructive stage can no longer ship.
    """
    words, p_t, la_t, ph_t = (
        target["words"], target["p"], target["la"], target["ph"]
    )
    w_l = p_t ** (1.0 / temp)
    w_l = w_l / jnp.sum(w_l)
    n_rows = words.shape[0]
    pad = (-n_rows) % chunk

    def chunked(x, extra_shape=()):
        pw = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, pw).reshape((-1, chunk) + extra_shape)

    wc = chunked(words, (words.shape[1],))
    pc, lac, phc, wlc = map(chunked, (p_t, la_t, ph_t, w_l))
    vc = chunked(jnp.ones((n_rows,), jnp.float32))

    def loss_fn(prm):
        @jax.checkpoint
        def part(xs):
            w, p, la_tc, ph_tc, wl, vmask = xs
            la, ph = anqs.log_psi(prm, w)
            # Pad rows (vmask 0) are masked-out determinants whose la
            # can be -inf/-1e30; a multiplicative mask still yields
            # 0 * inf = NaN, so SELECT with where before any arithmetic.
            la = jnp.where(vmask > 0, la, 0.0)
            ph = jnp.where(vmask > 0, ph, 0.0)
            rmask = vmask * (wl > 0)
            dd = rmask * (la - la_tc)
            dph = rmask * (ph - ph_tc)
            return (
                jnp.sum(p * vmask * la),
                jnp.sum(wl * dd),
                jnp.sum(wl * dd * dd),
                jnp.sum(wl * dph * dph),
                # la is clamped before exp: a transient optimizer spike
                # above la~44 overflows f32 and NaN-poisons the run.
                jnp.sum(vmask * jnp.exp(2.0 * jnp.minimum(la, 20.0))),
            )

        s = jax.lax.map(part, (wc, pc, lac, phc, wlc, vc))
        ce = -2.0 * jnp.sum(s[0])
        c = jnp.sum(s[1])
        amp = jnp.sum(s[2]) - c * c
        pml = jnp.sum(s[3])
        m = jnp.sum(s[4])
        if kind == "lin":
            pen = lam * (1.0 - m)
        elif kind == "log":
            pen = -lam * jnp.log(jnp.maximum(m, 1e-6))
        else:
            pen = lam * (1.0 - m) ** 2
        return ce + amp + pml + pen, (ce, amp, pml, m)

    metrics = jax.jit(lambda prm: loss_fn(prm)[1])
    info = []
    best_e, best_params = None, None
    if accept_fn is not None:
        # The input state is acceptance candidate #0: a polish that only
        # ever worsens the energy must return the untouched input.
        best_e, best_params = float(accept_fn(params)), params
    for si, lr in enumerate(lrs):
        opt = optax.chain(
            optax.clip_by_global_norm(10.0),
            optax.adam(lr),
        )

        def body(state, _):
            p, o, bl, bp = state
            (l, _), g = jax.value_and_grad(loss_fn, has_aux=True)(p)
            better = l < bl
            bl = jnp.where(better, l, bl)
            bp = jax.tree.map(
                lambda a, b: jnp.where(better, a, b), p, bp
            )
            up, o = opt.update(g, o, p)
            return (optax.apply_updates(p, up), o, bl, bp), l

        run_window = jax.jit(
            lambda st: jax.lax.scan(body, st, None, length=window)
        )
        state = (
            params, opt.init(params),
            jnp.asarray(jnp.inf, jnp.float32), params,
        )
        for _ in range(max(1, steps // window)):
            state, _ = run_window(state)
        pf, _, bl, bp = state

        @jax.jit
        def final_best(pf, bl, bp):
            lf, _ = loss_fn(pf)
            return (
                jax.tree.map(
                    lambda a, b: jnp.where(lf < bl, a, b), pf, bp
                ),
                jnp.minimum(lf, bl),
            )

        params, bl = final_best(pf, bl, bp)
        _, _, _, m = metrics(params)
        row = {"stage": si, "lr": lr, "loss": float(bl), "mass": float(m)}
        if accept_fn is not None:
            e_stage = float(accept_fn(params))
            row["energy"] = e_stage
            if best_e is None or e_stage < best_e:
                best_e, best_params = e_stage, params
                row["accepted"] = True
            else:
                params = best_params  # roll back before the next stage
                row["accepted"] = False
        info.append(row)
        if on_stage is not None:
            on_stage(row, params)
    if accept_fn is not None and best_params is not None:
        params = best_params
    return params, info


def sampled_full_energy(vmc, params, key, sample_num: int = 16384,
                        row_chunk: Optional[int] = None):
    """The ladder-artifact protocol: every connected amplitude of a
    fresh Gumbel sample evaluated through the network, Born-weighted f64
    reduction. Returns (energy, variance).

    ``row_chunk`` splits the sample into row blocks dispatched
    separately (host-side f64 combine): the unchunked (B, M) connected
    evaluation exhausts v5e HBM beyond B*M ~ 2^27 (C2H4: 8192 x 20776
    amplitudes crashes the worker; CLAUDE.md), and per-chunk dispatches
    also stay under the worker's ~60 s single-dispatch watchdog.
    """
    s = jax.jit(
        lambda p, k: gumbel_top_k_sample(vmc.anqs, p, k, sample_num)
    )(params, key)
    valid = np.asarray(s.valid)
    assert bool(valid.all()), "sample not full; shrink sample_num"
    sw, _ = keyops.sort_words(s.words)
    if row_chunk is None:
        la, ph = vmc.anqs.log_psi(params, sw)
        e_re, _, var = vmc._full_energy(
            params, sw, la, ph, jnp.ones((sw.shape[0],), bool)
        )
        return float(e_re), float(var)

    la, ph = jax.jit(vmc.anqs.log_psi)(params, sw)

    def impl(params_, w_, la_, ph_, consts):
        with vmc._bound_consts(consts):
            e = vmc.engine.local_energy_full(
                vmc.anqs, params_, w_, la_, ph_,
                jnp.ones((w_.shape[0],), bool),
            )
        return e.e_re

    fe_chunk = jax.jit(impl)
    consts = vmc.device_consts()
    n = sw.shape[0]
    assert n % row_chunk == 0, (n, row_chunk)
    e_rows = np.concatenate([
        np.asarray(fe_chunk(
            params, sw[i:i + row_chunk], la[i:i + row_chunk],
            ph[i:i + row_chunk], consts,
        ), np.float64)
        for i in range(0, n, row_chunk)
    ])
    la64 = np.asarray(la, np.float64)
    w = np.exp(2.0 * (la64 - la64.max()))
    w = w / w.sum()
    e = float(w @ e_rows)
    var = float(w @ (e_rows - e) ** 2)
    return e, var


def support_vmc(anqs, params, target, h_csr, e_nuc: float, *,
                lrs=(3e-4, 1e-4, 3e-5), steps_per_stage: int = 600,
                chunk: int = 16384, mass_lam: float = 0.0,
                grad_clip: float = 10.0, log_every: int = 25,
                sr_k: int = 0, sr_eps: float = 1e-4,
                objective: str = "rq",
                refit_temp: float = 2.0,
                refit_phase_weight: float = 1.0,
                refit_clip: float = 3.0,
                refit_beta: float = 1.0,
                target_coef: Optional[np.ndarray] = None,
                select: Optional[str] = None,
                accept_baseline: Optional[float] = None,
                on_log: Optional[Callable] = None,
                on_stage: Optional[Callable] = None,
                accept_fn: Optional[Callable] = None):
    """Support-restricted deterministic VMC: minimize the EXACT Rayleigh
    quotient of the network over the enriched support.

    Round-3 C2H4 post-mortem (runs/c2h4_sci): CE distillation saturates
    its floor (best CE ~ target entropy 1.023 nats) at only 62% of the
    correlation energy -- cross-entropy barely weights the amplitude
    tail that carries the energy, and the tempered-regression polish is
    a proxy loss that can (and did, -47% corr) decrease while the energy
    rises. This optimizer uses the energy itself:

      device:  la, ph = log_psi(params, support)        (chunked)
      host:    c = exp(la + i ph);  e_loc = (H_S c)/c   (exact f64 CSR
               sparse matvec over the restricted Hamiltonian -- every
               connection inside the support, no sampling, no proxy)
      device:  surrogate grad  2 sum_i g_i la_i + 2 sum_i h_i ph_i,
               g = p (Re e_loc - E), h = p Im e_loc     (f64 on host;
               the PRODUCT is passed to the device because p alone
               underflows f32 at |S| = 262k, p_min ~ 1e-39)

    The fixed point is the restricted ground state (the selected-CI
    target vector, 98.6% corr for the C2H4 target); the exact restricted
    energy is computed every step for free and drives best-snapshot
    selection. Off-support leak is invisible to the restricted quotient,
    so ``mass_lam`` adds the linear on-support-mass penalty from
    ``polish`` and the mass is logged every step.

    ``accept_fn(params) -> float`` (the sampled FULL energy) guards
    stage transitions exactly as in ``polish``.

    ``objective`` selects the host-side (g, h) formula fed to the same
    device surrogate:

      "rq"      -- the energy gradient above (default);
      "overlap" -- gradient of the negative log-fidelity
                   L = -log |<t|psi>|^2 + log <psi|psi> against the
                   known selected-CI target vector:
                     g_i = p_i - Re(z* t_i* c_i) / |z|^2,
                     h_i =       Im(z* t_i* c_i) / |z|^2,
                   z = <t|psi>.  Near the optimum the fidelity bowl has
                   uniform curvature where the Rayleigh quotient's
                   flattens by the spectral gap (the measured wave-3
                   C2H4 tail rate was ~4 mHa/900 iters); the exact rq
                   is still computed every step for logging and
                   best-snapshot selection, so a fidelity ascent that
                   does not lower the energy can never ship.
      ``target_coef`` (f64, same det order as the target) supplies the
      exact amplitudes; default rebuilds them from target["p"]/["ph"]
      (f32-clamped at 1e-30 -- fine for overlap, the tail contributes
      O(sqrt(p)) to z).

    ``sr_k > 0`` applies the MinSR preconditioner (optim/sr.py) over
    the top-``sr_k`` support rows by Born weight before the optimizer
    update: the raw energy gradient descends ~linearly into the
    ill-conditioned tail (measured on LiH: 4.7 mHa left after 1200
    plain-Adam steps), and the sample-space Woodbury solve is the
    repo's proven fix (the N2 flagship runs SR top-50).

    No reference counterpart; this is the round-4 answer to VERDICT
    item 1 (reference peaked-regime machinery: run_pyscf.py:304 IPR).
    """
    words, p_t = target["words"], target["p"]
    n_rows = words.shape[0]
    pad = (-n_rows) % chunk
    n_ch = (n_rows + pad) // chunk

    wc = jnp.pad(words, ((0, pad), (0, 0))).reshape(
        (n_ch, chunk, words.shape[1])
    )
    vmask = jnp.pad(jnp.ones((n_rows,), jnp.float32), (0, pad)).reshape(
        (n_ch, chunk)
    )

    @jax.jit
    def forward(prm):
        def part(xs):
            w, vm = xs
            la, ph = anqs.log_psi(prm, w)
            la = jnp.where(vm > 0, la, -100.0)
            ph = jnp.where(vm > 0, ph, 0.0)
            return la, ph

        la, ph = jax.lax.map(part, (wc, vmask))
        return la.reshape(-1)[:n_rows], ph.reshape(-1)[:n_rows]

    def loss_fn(prm, gc, hc_):
        @jax.checkpoint
        def part(xs):
            w, vm, g, h = xs
            la, ph = anqs.log_psi(prm, w)
            la = jnp.where(vm > 0, la, 0.0)
            ph = jnp.where(vm > 0, ph, 0.0)
            mass = jnp.sum(vm * jnp.exp(2.0 * jnp.minimum(la, 20.0)))
            return jnp.sum(g * la + h * ph), mass

        s, m = jax.lax.map(part, (wc, vmask, gc, hc_))
        loss = 2.0 * jnp.sum(s)
        if mass_lam:
            loss = loss + mass_lam * (1.0 - jnp.sum(m))
        return loss, jnp.sum(m)

    if sr_k > 0:
        from ..optim.sr import SRConfig, sr_transform

        sr_cfg = SRConfig(max_indices_num=sr_k, reg_eps=sr_eps)

        def make_step(opt):
            @jax.jit
            def step(prm, ost, gc, hc_, top_words, top_f):
                (_, m), grads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(prm, gc, hc_)
                grads = sr_transform(
                    anqs, prm, grads, top_words, top_f, sr_cfg
                )
                up, ost = opt.update(grads, ost, prm)
                return optax.apply_updates(prm, up), ost, m

            return step

        np_words = np.asarray(words)
    else:
        def make_step(opt):
            @jax.jit
            def step(prm, ost, gc, hc_):
                (_, m), grads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(prm, gc, hc_)
                up, ost = opt.update(grads, ost, prm)
                return optax.apply_updates(prm, up), ost, m

            return step

    h64 = h_csr  # scipy CSR, f64, no e_nuc on the diagonal
    if objective not in ("rq", "overlap", "refit", "rq_refit"):
        raise ValueError(f"unknown objective {objective!r}")
    t_c = None
    if objective in ("overlap", "refit", "rq_refit"):
        if target_coef is not None:
            t_c = np.asarray(target_coef, np.float64)
        else:
            a_t = np.sqrt(np.asarray(target["p"], np.float64))
            t_c = a_t * np.cos(np.asarray(target["ph"], np.float64))
        t_c = t_c / np.linalg.norm(t_c)
    if objective in ("refit", "rq_refit"):
        # Tempered log-profile + circular phase refit against the known
        # selected-CI vector (round-5 C2H4 counterfactual diagnosis,
        # runs/c2h4_sci/diag_counterfactual.json): the trained state's
        # 27.4 mHa restricted gap is MAGNITUDE mis-shaping -- ranks
        # 1k-10k hold half their target mass, ranks 10k-100k 40x too
        # little -- and both rq gradients (prop. to p_net) and CE/fid
        # gradients are exponentially suppressed exactly on those
        # starved rows. This objective regresses la on log|t| directly
        # (gradient prop. to the TEMPERED target weight, no
        # suppression), offset-free in both la (normalization freedom)
        # and phase (GLOBAL-PHASE freedom + 2pi wrap: the polish's
        # absolute (ph - ph_t)^2 term fights the state's arbitrary
        # global phase -- measured -2.6 rad on ckpt_43 -- which is the
        # round-3 'polish wreck' failure mode; here the phase loss is
        # w*(1 - cos(dph - theta*)) with theta* the optimal global
        # offset, envelope-differentiated).  Exact-rq best-snapshot
        # selection each iteration means a profile step that hurts the
        # energy can never ship.
        w_ref = np.abs(t_c) ** (2.0 / refit_temp)
        w_ref = w_ref / w_ref.sum()
        la_t = np.log(np.maximum(np.abs(t_c), 1e-300))
        ph_t = np.where(t_c < 0, np.pi, 0.0)
    # Stage-end snapshot policy. "rq" (energy best-snapshot) is the
    # safety default for energy waves; a REPAIR wave (refit/rq_refit)
    # must be allowed to raise rq while it un-starves the tail -- under
    # "rq" its endpoint is always discarded and the wave is a
    # structural no-op (q12_refit2 live lesson: rq rose monotonically,
    # best_rq_params stayed at iter 0). Repair waves select by refit
    # LOSS and hand that endpoint to the follow-on energy wave, whose
    # acceptance (vs ``accept_baseline``, the GLOBAL incumbent sampled
    # energy) remains the ship/no-ship guard.
    if select is None:
        select = "loss" if objective in ("refit", "rq_refit") else "rq"
    if select not in ("rq", "loss", "last"):
        raise ValueError(f"unknown select {select!r}")
    info = []
    best_e, best_params = None, None
    if accept_baseline is not None:
        best_e, best_params = float(accept_baseline), params
    elif accept_fn is not None:
        best_e, best_params = float(accept_fn(params)), params

    for si, lr in enumerate(lrs):
        opt = optax.chain(
            optax.clip_by_global_norm(grad_clip), optax.adam(lr)
        )
        step = make_step(opt)
        ost = opt.init(params)
        best_rq, best_rq_params = np.inf, params
        best_loss, best_loss_params = np.inf, params
        for it in range(steps_per_stage):
            la, ph = forward(params)
            la64 = np.asarray(la, np.float64)
            ph64 = np.asarray(ph, np.float64)
            c = np.exp(la64 - la64.max()) * (
                np.cos(ph64) + 1j * np.sin(ph64)
            )
            nrm = float(np.vdot(c, c).real)
            hc = h64 @ c
            e_loc = hc / c
            p = (c.conj() * c).real / nrm
            e_r = float(p @ e_loc.real)
            rq = e_r + e_nuc
            if rq < best_rq:
                best_rq, best_rq_params = rq, params
            if objective == "overlap":
                w_ov = t_c * c / np.sqrt(nrm)  # t_i* c_i (t real)
                z = w_ov.sum()
                n_ov = (z.conj() * z).real
                zw = (np.conj(z) * w_ov) / max(n_ov, 1e-300)
                g = (p - zw.real).astype(np.float32)
                h = zw.imag.astype(np.float32)
            elif objective in ("refit", "rq_refit"):
                dla = la64 - la_t
                mu = float(w_ref @ dla)
                # Residual CLAMP (round-5 live lesson, q11_refit attempt
                # 1): the starved tail sits at dla ~ -13..-25, and the
                # unclamped pull 2*w*dla slammed the co-adapted top
                # amplitudes -- rq collapsed -78.19 -> -77.2 within 75
                # Adam steps at lr 3e-4. Bounding the residual keeps the
                # pull DIRECTIONAL (every starved det rises at the same
                # capped rate) without the magnitude blowup.
                r_la = np.clip(dla - mu, -refit_clip, refit_clip)
                g = (2.0 * w_ref * r_la)
                dph = ph64 - ph_t
                z_ph = complex(w_ref @ np.exp(1j * dph))
                theta = np.angle(z_ph)
                h = (refit_phase_weight * w_ref * np.sin(dph - theta))
                refit_loss = float(
                    w_ref @ (dla - mu) ** 2
                    + refit_phase_weight
                    * (w_ref @ (1.0 - np.cos(dph - theta)))
                )
                if refit_loss < best_loss:
                    best_loss, best_loss_params = refit_loss, params
                if objective == "rq_refit":
                    # Mixed pull: the rq gradient protects the energy on
                    # the high-p rows (where it dominates the tempered
                    # term), the clamped refit term dominates exactly on
                    # the starved rows where p ~ 0 makes the rq gradient
                    # invisible.
                    g = p * (e_loc.real - e_r) + refit_beta * g
                    h = p * e_loc.imag + refit_beta * h
                g = g.astype(np.float32)
                h = h.astype(np.float32)
            else:
                g = (p * (e_loc.real - e_r)).astype(np.float32)
                h = (p * e_loc.imag).astype(np.float32)

            def pack(x):
                return jnp.pad(jnp.asarray(x), (0, pad)).reshape(
                    (n_ch, chunk)
                )

            if sr_k > 0:
                k_eff = min(sr_k, n_rows)
                idx = np.argpartition(-p, k_eff - 1)[:k_eff]
                top_f = p[idx]
                top_f = (top_f / top_f.sum()).astype(np.float32)
                params, ost, m = step(
                    params, ost, pack(g), pack(h),
                    jnp.asarray(np_words[idx]), jnp.asarray(top_f),
                )
            else:
                params, ost, m = step(params, ost, pack(g), pack(h))
            if (it % log_every == 0 or it == steps_per_stage - 1) \
                    and on_log is not None:
                row_log = {"stage": si, "iter": it, "rq": rq,
                           "mass": float(m), "best_rq": best_rq}
                if objective == "overlap":
                    row_log["fid"] = n_ov
                elif objective in ("refit", "rq_refit"):
                    row_log["refit_loss"] = refit_loss
                on_log(row_log)
        if select == "rq":
            params = best_rq_params
        elif select == "loss":
            params = best_loss_params
        row = {"stage": si, "lr": lr, "best_rq": best_rq}
        if select == "loss":
            row["best_loss"] = best_loss
        if accept_fn is not None:
            e_stage = float(accept_fn(params))
            row["energy"] = e_stage
            if best_e is None or e_stage < best_e:
                best_e, best_params = e_stage, params
                row["accepted"] = True
            else:
                params = best_params
                row["accepted"] = False
        info.append(row)
        if on_stage is not None:
            on_stage(row, params)
    if accept_fn is not None and best_params is not None:
        params = best_params
    return params, info


def support_vmc_lbfgs(anqs, params, target, h_csr, e_nuc: float, *,
                      maxiter: int = 2000, segment: int = 200,
                      chunk: int = 16384, mass_lam: float = 3.0,
                      mass_floor: Optional[float] = None,
                      mass_width: float = 2e-4,
                      mass_slack: float = 0.0,
                      history: int = 20, log_every: int = 25,
                      on_log: Optional[Callable] = None,
                      on_stage: Optional[Callable] = None,
                      accept_fn: Optional[Callable] = None):
    """Quasi-Newton support-restricted VMC: scipy L-BFGS-B on the exact
    restricted Rayleigh quotient (+ the linear on-support-mass penalty).

    The support problem is DETERMINISTIC full-batch with exact f64
    gradients (the ``support_vmc`` surrogate), which is quasi-Newton's
    home turf: first-order methods descend the ill-conditioned tail
    ~linearly (wave-3 C2H4 measured ~4 mHa/900 Adam iters at the end),
    while curvature pairs capture it. LiH A/B from the same CE warm
    start: Adam +0.62 mHa after 600 iters (the proven 4-stage ladder:
    +0.141 after 2400); L-BFGS +0.135 after 35 evals and +0.0045 after
    662 -- ~140x less residual at equal evals. MinSR over top-k rows
    (sr_k=64: +0.61) does NOT help -- the tail error is outside the
    top-k jacobian span -- and the log-fidelity objective
    (objective='overlap': +0.90) is tail-blind like CE; the curvature,
    not the objective, is the bottleneck.

    Objective: f(x) = rq(x) + a smooth HINGE barrier on the on-support
    mass, mass_lam * w * softplus((mass_floor - mass) / w). Mass is the
    RAW on-support probability mass (autoregressive networks are
    full-space normalized, so 1 - mass is exactly the off-support leak,
    invisible to the restricted quotient and ~Ha-expensive in the
    sampled full energy). Why a hinge and not the Adam path's linear
    penalty: both constant-gradient variants fail at C2H4 scale --
    lam=3 strangles the line search (3 uHa/25 evals, premature scipy
    convergence: the penalty's stiff mass mode couples every
    coordinate), and lam=0 lets the optimizer CHEAT: the measured
    stage-41 segment gained 2.2 mHa of exact rq while leaking
    7e-4 of mass, and the sampled full energy moved 0.0 mHa -- the
    leaked junk sits ~3 Ha up, paying back exactly the rq gain. The
    hinge is a constraint, not an objective term: zero force while
    mass >= mass_floor (L-BFGS optimizes pure rq), a mass_lam pull when
    below. ``mass_floor`` defaults to the warm start's own mass.
    Gradient: g_i += -mass_lam * sigmoid((mass_floor - mass)/w) * q_i
    (q = exp(2 la), unnormalized).

    Runs in ``segment``-eval restarts (scipy cannot checkpoint its
    curvature history; a relay outage mid-run must not lose hours) --
    each segment ends with best-exact-rq selection, an optional
    ``accept_fn`` sampled-full-energy acceptance (rollback exactly as
    in ``support_vmc``), and ``on_stage``. ~10-20% extra evals vs one
    monolithic run, bounded loss on failure.
    """
    import scipy.optimize
    from jax.flatten_util import ravel_pytree

    words = target["words"]
    n_rows = words.shape[0]
    pad = (-n_rows) % chunk
    n_ch = (n_rows + pad) // chunk
    wc = jnp.pad(words, ((0, pad), (0, 0))).reshape(
        (n_ch, chunk, words.shape[1])
    )
    vmask = jnp.pad(jnp.ones((n_rows,), jnp.float32), (0, pad)).reshape(
        (n_ch, chunk)
    )
    flat0, unravel = ravel_pytree(params)

    @jax.jit
    def forward(prm):
        def part(xs):
            w, vm = xs
            la, ph = anqs.log_psi(prm, w)
            return (jnp.where(vm > 0, la, -100.0),
                    jnp.where(vm > 0, ph, 0.0))

        la, ph = jax.lax.map(part, (wc, vmask))
        return la.reshape(-1)[:n_rows], ph.reshape(-1)[:n_rows]

    @jax.jit
    def sur_grad(prm, gc, hc_):
        def loss(p):
            @jax.checkpoint
            def part(xs):
                w, vm, g, h = xs
                la, ph = anqs.log_psi(p, w)
                la = jnp.where(vm > 0, la, 0.0)
                ph = jnp.where(vm > 0, ph, 0.0)
                return jnp.sum(g * la + h * ph)

            return 2.0 * jnp.sum(jax.lax.map(part, (wc, vmask, gc, hc_)))

        return jax.grad(loss)(prm)

    h64 = h_csr
    state = {"evals": 0, "best_rq": np.inf, "best_x": None,
             "last": None, "floor": mass_floor}

    def pack(x):
        return jnp.pad(jnp.asarray(x, jnp.float32), (0, pad)).reshape(
            (n_ch, chunk)
        )

    def f_and_g(x):
        state["evals"] += 1
        prm = unravel(jnp.asarray(x, jnp.float32))
        la, ph = forward(prm)
        la64 = np.asarray(la, np.float64)
        ph64 = np.asarray(ph, np.float64)
        c = np.exp(la64 - la64.max()) * (
            np.cos(ph64) + 1j * np.sin(ph64)
        )
        nrm = float(np.vdot(c, c).real)
        e_loc = (h64 @ c) / c
        p = (c.conj() * c).real / nrm
        e_r = float(p @ e_loc.real)
        rq = e_r + e_nuc
        q = np.exp(2.0 * np.minimum(la64, 20.0))
        mass = float(np.sum(q))
        if state["floor"] is None:
            # C2H4-scale measurement (runs/logs/c2h4_rql3_overdamped.log evals
            # 25-100): floor AT the warm-start mass with w=2e-4 leaves
            # sigmoid(0)=lam/2 of force at the start point -- 15-150x
            # the energy-gradient scale -- and L-BFGS spends the whole
            # segment RAISING mass (0.999802 -> 0.999822) while rq
            # worsens. The hinge must be a wall, not a slope: set the
            # floor `mass_slack` BELOW the warm start and make the
            # width small, so the interior force at the start is
            # lam*sigmoid(-slack/width) ~ O(1) and decays upward.
            state["floor"] = (mass_floor if mass_floor is not None
                              else mass - mass_slack)
        m0, w = state["floor"], mass_width
        # Smooth hinge: w*softplus((m0-mass)/w) -> 0 above the floor,
        # -> (m0-mass) below it; sigmoid is its exact derivative.
        u = (m0 - mass) / w
        pen = mass_lam * w * (np.logaddexp(0.0, u))
        sig = mass_lam / (1.0 + np.exp(-u))
        # Snapshot selection on rq, but only while the mass constraint
        # holds (a leaked state's rq overstates the full energy).
        if rq < state["best_rq"] and mass >= m0 - 2.0 * w:
            state["best_rq"], state["best_x"] = rq, np.array(x)
        g = (p * (e_loc.real - e_r)).astype(np.float32)
        if mass_lam:
            g = g - (sig * q).astype(np.float32)
        hh = (p * e_loc.imag).astype(np.float32)
        gp = sur_grad(prm, pack(g), pack(hh))
        gflat = np.asarray(ravel_pytree(gp)[0], np.float64)
        state["last"] = {"rq": rq, "mass": mass}
        if on_log is not None and state["evals"] % log_every == 0:
            on_log({"eval": state["evals"], "rq": rq, "mass": mass,
                    "best_rq": state["best_rq"]})
        return rq + pen, gflat

    info = []
    best_e, best_params = None, None
    if accept_fn is not None:
        best_e, best_params = float(accept_fn(params)), params

    x = np.asarray(flat0, np.float64)
    n_seg = max(1, -(-maxiter // segment))
    prev_best = np.inf
    for si in range(n_seg):
        state["best_rq"], state["best_x"] = np.inf, None
        res = scipy.optimize.minimize(
            f_and_g, x, jac=True, method="L-BFGS-B",
            options={"maxiter": segment, "maxcor": history,
                     "ftol": 1e-15, "gtol": 1e-12},
        )
        x = (state["best_x"] if state["best_x"] is not None
             else np.asarray(res.x))
        params = unravel(jnp.asarray(x, jnp.float32))
        row = {"stage": si, "lr": 0.0, "best_rq": state["best_rq"],
               "evals": state["evals"], "scipy_msg": str(res.message)}
        if accept_fn is not None:
            e_stage = float(accept_fn(params))
            row["energy"] = e_stage
            if best_e is None or e_stage < best_e:
                best_e, best_params = e_stage, params
                row["accepted"] = True
            else:
                row["accepted"] = False
        info.append(row)
        if on_stage is not None:
            on_stage(row, params)
        # Stop only on measured stagnation (< 1 uHa of exact-rq gain
        # over a whole segment). scipy's own early terminations
        # (line-search failures, the relative-f test tripping on f32
        # forward roughness -- observed at C2H4 scale with a stiff
        # mass penalty) are NOT convergence: a fresh restart clears
        # the stale curvature pairs and resumes descent.
        seg_gain = prev_best - state["best_rq"]
        if np.isfinite(prev_best) and seg_gain < 1e-6:
            break
        prev_best = min(prev_best, state["best_rq"])
    if accept_fn is not None and best_params is not None:
        params = best_params
    return params, info


def support_rayleigh(mol, target, anqs, params,
                     h_cache: Optional[str] = None):
    """Exact host Rayleigh quotient of the model restricted to the
    target support (the fit oracle; separates capacity from estimator
    effects)."""
    import scipy.sparse

    from ..chem import fci as fci_mod

    if h_cache and os.path.exists(h_cache):
        h = scipy.sparse.load_npz(h_cache)
    else:
        h = fci_mod.sparse_hamiltonian(target["dets"], mol.h1, mol.v)
        if h_cache:
            scipy.sparse.save_npz(h_cache, h)
    la, ph = jax.jit(anqs.log_psi)(params, target["words"])
    la = np.asarray(la, np.float64)
    c = np.exp(la - la.max()) * np.cos(np.asarray(ph, np.float64))
    return float(c @ (h @ c) / (c @ c)) + mol.e_nuc
