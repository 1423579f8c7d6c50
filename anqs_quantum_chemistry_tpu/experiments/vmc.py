"""VMC energy-optimization experiment: the jit-compiled training loop.

Counterpart of the reference EnergyOptExp driver (reference: nqs/nqs/
applications/quantum_chemistry/experiments/energy_opt_exp.py:308-734), with
the per-iteration pipeline (sample -> sort -> amplitudes -> local energies ->
REINFORCE surrogate loss -> grad -> SR -> optimizer) fused into ONE jitted
function of (params, opt_state, key). Metrics stream to a CSV row per
iteration; checkpoints via orbax.

The surrogate loss is the real-pair form of the reference's
``2 Re sum f log(psi*) (E_loc - E)`` (energy_opt_exp.py:609):

    loss = 2 sum_x f(x) [ log|psi(x)| Re(dE) + phase(x) Im(dE) ]

whose gradient equals the VMC energy gradient (f and E_loc held constant).
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..chem.molecule import Molecule
from ..models.anqs import ANQS, AnqsConfig
from ..observables.pauli import PauliEngine, mc_estimate
from ..ops import bits as bitops
from ..ops import keys
from ..optim.sr import SRConfig, sr_transform
from ..sampling.sampler import SamplingConfig, sample
from ..symmetries import QubitGrouping
from ..utils.config import Config
from .preparation import create_masker

import optax


@dataclasses.dataclass
class VMCConfig(Config):
    sample_num: int = 2000
    sampling_mode: str = "gumbel"
    multinomial_budget: Optional[int] = None
    symmetry_level: str = "e_num_spin"
    qubit_per_qudit: int = 6
    opt_type: str = "adam"
    lr: float = 1e-3
    # Optional piecewise-constant LR schedule [(start_iter, lr), ...]
    # (counterpart of the reference's opt_schedule, energy_opt_exp.py:483-501)
    lr_schedule: Optional[tuple] = None
    sr: Optional[SRConfig] = None
    grad_clip_norm: Optional[float] = None
    full_energy_period: Optional[int] = None
    use_theor_freqs: bool = True  # Born |psi|^2 reweighting vs counts
    couple_spin_flip: bool = False  # close sample set under alpha<->beta
    seed: int = 0
    iter_num: int = 500


class VMC:
    """Build the full stack for one molecule and run/step the optimization."""

    def __init__(
        self,
        mol: Optional[Molecule] = None,
        config: VMCConfig = None,
        anqs_config: AnqsConfig = None,
        run_dir: Optional[str] = None,
        mesh=None,
        ham=None,
        masker=None,
        ref_det: Optional[int] = None,
    ):
        """Either pass a Molecule (quantum chemistry) or an explicit
        (ham: PauliHamiltonian, masker: Masker) pair -- the latter serves
        e.g. spin systems (reference: nqs/nqs/applications/spin_systems/
        experiments/stochastic/sandbox.py:1-106)."""
        self.mol = mol
        self.mesh = mesh
        self.config = config or VMCConfig()
        if mol is not None:
            ham = mol.qubit_ham
            masker = create_masker(mol, self.config.symmetry_level)
            ref_det = mol.hf_det if ref_det is None else ref_det
        self.ham = ham
        self.masker = masker
        self.grouping = QubitGrouping.create(
            self.masker, qubit_per_qudit=self.config.qubit_per_qudit
        )
        self.anqs = ANQS(self.grouping, anqs_config or AnqsConfig())
        self.engine = PauliEngine(ham)
        self.sampling_config = SamplingConfig(
            sample_num=self.config.sample_num,
            mode=self.config.sampling_mode,
            budget=self.config.multinomial_budget,
        )

        if self.config.lr_schedule:
            entries = sorted(self.config.lr_schedule)
            lr = optax.piecewise_constant_schedule(
                init_value=entries[0][1],
                boundaries_and_scales={
                    int(start): new / old
                    for (_, old), (start, new) in zip(
                        entries[:-1], entries[1:]
                    )
                },
            )
        else:
            lr = self.config.lr
        if self.config.opt_type == "adam":
            self.opt = optax.adam(lr)
        elif self.config.opt_type == "sgd":
            self.opt = optax.sgd(lr)
        else:
            raise ValueError(self.config.opt_type)

        self.run_dir = run_dir
        if run_dir:
            os.makedirs(run_dir, exist_ok=True)
            with open(os.path.join(run_dir, "config.json"), "w") as f:
                f.write(self.config.to_json())

        self._step = jax.jit(self._step_impl)
        self._full_energy = jax.jit(self._full_energy_impl)
        self._multi_step_cache = {}

        # Packed reference determinant (HF) for the projected-energy metric.
        n = self.ham.qubit_num
        ref = ref_det if ref_det is not None else 0
        hf_bits = np.array([[(ref >> i) & 1 for i in range(n)]])
        self.hf_words = bitops.pack(jnp.asarray(hf_bits))

    def _multi_step(self, n_steps: int):
        """One device dispatch running ``n_steps`` training steps via
        lax.scan (amortizes per-dispatch latency -- ~0.4s through the TPU
        tunnel here -- over many ms-scale steps). Returns stacked metrics."""
        if n_steps not in self._multi_step_cache:

            def body(state, _):
                params, opt_state, key = state
                params, opt_state, key, metrics = self._step_impl(
                    params, opt_state, key
                )
                return (params, opt_state, key), metrics

            @jax.jit
            def run_n(params, opt_state, key):
                (params, opt_state, key), metrics = jax.lax.scan(
                    body, (params, opt_state, key), None, length=n_steps
                )
                return params, opt_state, key, metrics

            self._multi_step_cache[n_steps] = run_n
        return self._multi_step_cache[n_steps]

    # ------------------------------------------------------------------
    def init_state(self):
        key = jax.random.PRNGKey(self.config.seed)
        key, sub = jax.random.split(key)
        params = self.anqs.init(sub)
        opt_state = self.opt.init(params)
        return params, opt_state, key

    # ------------------------------------------------------------------
    def _step_impl(self, params, opt_state, key):
        key, sample_key = jax.random.split(key)
        words, weights, valid, stats = sample(
            self.anqs, params, sample_key, self.sampling_config
        )

        if self.config.couple_spin_flip:
            # Close the unique set under the global alpha<->beta spin flip
            # (reference: .../calculations/sample.py:88-99); duplicates are
            # removed after the canonical sort below.
            flipped = bitops.interleave_swap(words, self.ham.qubit_num)
            words = jnp.concatenate([words, flipped])
            weights = jnp.concatenate([weights, jnp.zeros_like(weights)])
            valid = jnp.concatenate([valid, valid])

        # Canonical sort with all-ones sentinels on invalid rows so
        # membership lookups can never match them.
        sentinel = jnp.full_like(words, bitops.UINT(0xFFFFFFFF))
        words = jnp.where(valid[:, None], words, sentinel)
        sorted_words, _, weights, valid_i = keys.sort_words(
            words, weights, valid.astype(jnp.int32)
        )
        valid = valid_i.astype(bool)
        if self.config.couple_spin_flip:
            valid = valid & keys.unique_mask(sorted_words)

        # Data-parallel sharding of the unique-determinant batch: amplitude
        # evaluation, matrix elements and estimator reductions run sharded
        # over the mesh's data axis (GSPMD inserts the collectives).
        from ..parallel.mesh import shard_rows

        sorted_words, weights, valid = shard_rows(
            (sorted_words, weights, valid), self.mesh
        )

        la, ph = self.anqs.log_psi(params, sorted_words)
        e = self.engine.local_energy_proxy(sorted_words, la, ph, valid)

        # Born reweighting over unique samples (use_theor_freqs default:
        # reference compute_local_energies.py:107-113); empirical counts
        # otherwise.
        theor = jnp.where(valid, jnp.exp(2.0 * la), 0.0)
        if self.config.use_theor_freqs:
            freqs = theor / jnp.maximum(jnp.sum(theor), 1e-30)
        else:
            freqs = weights / jnp.maximum(jnp.sum(weights), 1e-30)
        mean_re, mean_im, var = mc_estimate(e.e_re, e.e_im, freqs)

        d_re = jnp.where(valid, e.e_re - mean_re, 0.0)
        d_im = jnp.where(valid, e.e_im - mean_im, 0.0)

        def loss_fn(p):
            la_g, ph_g = self.anqs.log_psi(p, sorted_words)
            la_g = jnp.where(valid, la_g, 0.0)
            ph_g = jnp.where(valid, ph_g, 0.0)
            return 2.0 * jnp.sum(freqs * (la_g * d_re + ph_g * d_im))

        grads = jax.grad(loss_fn)(params)

        if self.config.sr is not None:
            grads = sr_transform(
                self.anqs, params, grads, sorted_words, freqs,
                self.config.sr,
            )
        if self.config.grad_clip_norm is not None:
            grads, _ = _clip(grads, self.config.grad_clip_norm)

        updates, opt_state = self.opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)

        # HF-projected local energy: E_loc at the HF determinant.
        hf_idx, hf_found = keys.searchsorted_words(
            sorted_words, self.hf_words
        )
        hf_e = jnp.where(
            hf_found[0], e.e_re[jnp.clip(hf_idx[0], 0, la.shape[0] - 1)],
            jnp.nan,
        )

        metrics = {
            "energy": mean_re,
            "energy_imag": mean_im,
            "energy_var": var,
            "unique_num": jnp.sum(valid),
            "sampled_prob": jnp.sum(theor),
            "found_pairs": e.found_pairs,
            "hf_proj_energy": hf_e,
            "grad_norm": optax.global_norm(grads),
            "max_log_abs": jnp.max(jnp.where(valid, la, -jnp.inf)),
            "ipr": jnp.sum(freqs**2),
        }
        return params, opt_state, key, metrics

    # ------------------------------------------------------------------
    def _full_energy_impl(self, params, key):
        """Unbiased full local energies: every connected amplitude evaluated
        through the network (reference's periodic full-energy measurement,
        energy_opt_exp.py:568-575 -> pauli_observable.py:992-1105)."""
        words, weights, valid, _ = sample(
            self.anqs, params, key, self.sampling_config
        )
        sentinel = jnp.full_like(words, bitops.UINT(0xFFFFFFFF))
        words = jnp.where(valid[:, None], words, sentinel)
        la, ph = self.anqs.log_psi(params, words)
        e = self.engine.local_energy_full(
            self.anqs, params, words, la, ph, valid
        )
        theor = jnp.where(valid, jnp.exp(2.0 * la), 0.0)
        freqs = theor / jnp.maximum(jnp.sum(theor), 1e-30)
        mean_re, mean_im, var = mc_estimate(e.e_re, e.e_im, freqs)
        return mean_re, mean_im, var

    # ------------------------------------------------------------------
    def save_checkpoint(self, path: str, params, opt_state, key, it: int):
        """Orbax checkpoint of (params, opt state, PRNG key, iteration) --
        the resume-capable upgrade over the reference's state_dict snapshots
        (reference: energy_opt_exp.py:698-703)."""
        import orbax.checkpoint as ocp

        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(
                os.path.abspath(path),
                {
                    "params": params,
                    "opt_state": opt_state,
                    "key": key,
                    "iter": jnp.asarray(it),
                },
                force=True,
            )

    def load_checkpoint(self, path: str):
        import orbax.checkpoint as ocp

        params, opt_state, key = self.init_state()
        template = {
            "params": params,
            "opt_state": opt_state,
            "key": key,
            "iter": jnp.asarray(0),
        }
        with ocp.StandardCheckpointer() as ckptr:
            state = ckptr.restore(os.path.abspath(path), template)
        return (
            state["params"],
            state["opt_state"],
            state["key"],
            int(state["iter"]),
        )

    # ------------------------------------------------------------------
    def run(
        self,
        iter_num: Optional[int] = None,
        log_every: int = 50,
        on_iter=None,
        checkpoint_every: Optional[int] = 1000,
        resume_from: Optional[str] = None,
        profile_iters: Optional[tuple] = None,
        steps_per_call: int = 1,
    ):
        """Full training loop with CSV metrics; returns final state+history.

        ``profile_iters=(start, stop)`` captures a jax.profiler trace of those
        iterations into ``<run_dir>/profile`` (the TPU-native upgrade over
        the reference's wall-clock @timed decorators, SURVEY.md section 5.1).
        """
        iter_num = iter_num or self.config.iter_num
        start_iter = 0
        if resume_from:
            params, opt_state, key, start_iter = self.load_checkpoint(
                resume_from
            )
        else:
            params, opt_state, key = self.init_state()
        history = []
        csv_path = (
            os.path.join(self.run_dir, "result.csv") if self.run_dir else None
        )
        best = {"energy": np.inf, "iter": -1}
        t0 = time.perf_counter()

        def handle_row(it, row, params, opt_state, key):
            row["iter_idx"] = it
            row["wall_time"] = time.perf_counter() - t0
            row.setdefault("full_energy", float("nan"))
            row.setdefault("full_energy_var", float("nan"))
            history.append(row)
            if row["energy"] < best["energy"]:
                best.update({"energy": row["energy"], "iter": it})
                if self.run_dir:
                    np.save(
                        os.path.join(self.run_dir, "best_energy.npy"),
                        np.array([best["energy"], best["iter"]]),
                    )
            if csv_path:
                write_header = not os.path.exists(csv_path)
                with open(csv_path, "a") as f:
                    if write_header:
                        f.write(",".join(row.keys()) + "\n")
                    f.write(",".join(str(v) for v in row.values()) + "\n")
            if (
                checkpoint_every
                and self.run_dir
                and (it + 1) % checkpoint_every == 0
            ):
                self.save_checkpoint(
                    os.path.join(self.run_dir, f"ckpt_{it + 1}"),
                    params, opt_state, key, it + 1,
                )
            if on_iter is not None:
                on_iter(it, row)

        it = start_iter
        while it < iter_num:
            if profile_iters and it >= profile_iters[0] and self.run_dir:
                if it == profile_iters[0]:
                    jax.profiler.start_trace(
                        os.path.join(self.run_dir, "profile")
                    )
            if steps_per_call > 1:
                k_steps = min(steps_per_call, iter_num - it)
                params, opt_state, key, stacked = self._multi_step(
                    k_steps
                )(params, opt_state, key)
                stacked = {
                    k: np.asarray(v) for k, v in stacked.items()
                }
                for j in range(k_steps):
                    handle_row(
                        it + j,
                        {k: float(v[j]) for k, v in stacked.items()},
                        params, opt_state, key,
                    )
                it += k_steps
            else:
                params, opt_state, key, metrics = self._step(
                    params, opt_state, key
                )
                row = {k: float(v) for k, v in metrics.items()}
                period = self.config.full_energy_period
                if period and it > 0 and it % period == 0:
                    key, sub = jax.random.split(key)
                    fe_re, fe_im, fe_var = self._full_energy(params, sub)
                    row["full_energy"] = float(fe_re)
                    row["full_energy_var"] = float(fe_var)
                handle_row(it, row, params, opt_state, key)
                it += 1
            if profile_iters and it > profile_iters[1] and self.run_dir:
                jax.block_until_ready(params)
                jax.profiler.stop_trace()
                profile_iters = None
        return params, opt_state, history, best


def _clip(grads, max_norm):
    import jax.numpy as jnp
    from jax.flatten_util import ravel_pytree

    flat, unravel = ravel_pytree(grads)
    norm = jnp.linalg.norm(flat)
    scale = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-30))
    return unravel(flat * scale), norm
