"""Autoregressive neural quantum state over qudits (functional core).

TPU-native counterpart of the reference's AbstractANQS + LogAbsPhase/LogPsi
heads (reference: nqs/nqs/stochastic/ansatzes/anqs/abstract_anqs.py:309-485,
log_abs_phase_anqs.py:24-163, log_psi_anqs.py:14-59):

* ``log_psi`` returns a real pair ``(log_abs, phase)`` instead of a complex
  tensor -- complex dtypes are avoided on TPU entirely.
* Conditional distributions come from one MADE forward per batch
  (all qudits at once); NADE mode uses per-qudit subnets.
* Symmetry masks are table lookups on the packed memo index (no acc-eig
  tensors at runtime); masked slots get NEG, normalization is a masked
  log-softmax of 2*log|psi| (reference normalise_cond_log,
  abstract_anqs.py:392-405).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import bits as bitops
from ..symmetries.grouping import QubitGrouping
from .made import MadeSpec, made_apply, made_init

NEG = jnp.float32(-1e30)


@dataclasses.dataclass(frozen=True)
class AnqsConfig:
    head_mode: str = "log_abs_phase"  # or "log_psi" (single 2-channel net)
    net_type: str = "made"  # 'made' | 'nade' | 'transformer'
    hidden_widths: Tuple[int, ...] = (512,)
    aux_hidden_widths: Tuple[int, ...] = (512,)
    # Per-layer patterns (reference PatternConfig family, mlp.py:13-70):
    # ``activation`` accepts one name (uniform), a per-hidden-layer tuple,
    # or the 'sanqs_paper' preset (tanh then leaky_relu); ``bias`` accepts
    # a bool or a depth+1 tuple (hidden layers + output layer).
    activation: object = "tanh"
    bias: object = True
    residual: bool = True
    subtract_mean: bool = True
    compute_dtype: str = "float32"
    masking_mode: str = "masked"  # 'masked' (MU) or 'unmasked' (DU)
    # Per-qudit local sampling pattern: the LAST ``masking_depth`` qudits
    # sample/normalize unmasked (DU) while the head stays masked-unique --
    # the reference's knob for peaked wavefunctions where tail masking
    # overhead outweighs the symmetry projection
    # (reference LocalSamplingConfig, abstract_anqs.py:18-50).
    masking_depth: int = 0
    # Spin-flip (alpha<->beta) symmetrization of the ansatz itself
    # (reference SpinFlipSymmetryConfig, abstract_anqs.py:53-67; conditional
    # coupling :320-326, phase coupling :466-474):
    # ``spin_flip_abs`` averages each conditional log|psi| with the
    # flip-transformed conditional of the flipped prefix, making
    # |psi(flip x)| == |psi(x)| exactly; ``spin_flip_phase`` symmetrizes the
    # global phase and adds the fermionic reordering sign pi*(n_open//2 % 2)
    # on the non-canonical member of each {x, flip x} orbit.
    spin_flip_abs: bool = False
    spin_flip_phase: bool = False
    # Soft cap on raw per-continuation log-abs conditionals:
    # la -> cap * tanh(la / cap). Bounds the per-qudit conditional
    # contrast to ~2*cap nats, which keeps Born weights representable and
    # gradients alive on peaked >50-qubit wavefunctions (without it the
    # log-amplitude contrast can run away until freq-weighted gradients
    # underflow f32 to exactly zero and training freezes).
    logit_cap: object = None  # None | float
    # Matmul multiply precision inside the nets ('highest' | 'float32' |
    # 'bfloat16' | None = backend default). The TPU default multiplies
    # f32 operands in bf16; that noise floor stalls SUPERVISED
    # distillation of peaked targets (H2O CISD distill: CE plateaus at
    # 0.43 vs the 0.188 entropy floor on the v5e, converges on CPU) --
    # set 'highest' for transformer pretraining on TPU.
    matmul_precision: object = None
    # transformer hyperparameters (net_type='transformer'):
    d_model: int = 64
    n_heads: int = 4
    n_layers: int = 2
    d_ff: int = 256


class ANQS:
    """Static model context; parameters live in a separate pytree.

    ``sign_structure``: optional fixed per-determinant phase table (values in
    {0, pi}) of length 2**qubit_num (<= 24 qubits) that REPLACES the learned
    phase -- the reference's ``use_sign_structure`` option
    (reference: abstract_anqs.py:70-109, log_psi path :458-481).
    """

    def __init__(
        self,
        grouping: QubitGrouping,
        config: AnqsConfig = None,
        sign_structure=None,
    ):
        self.config = config or AnqsConfig()
        self.grouping = grouping
        self.sign_structure = None
        if sign_structure is not None:
            assert grouping.qubit_num <= 24
            assert len(sign_structure) == 2**grouping.qubit_num
            self.sign_structure = jnp.asarray(
                sign_structure, dtype=jnp.float32
            )
        self.qubit_num = grouping.qubit_num
        self.n_words = bitops.n_words(self.qubit_num)
        self.qudit_num = grouping.qudit_num
        self.max_dim = grouping.max_qudit_dim
        self.qudit_starts = grouping.qudit_starts
        self.qudit_widths = grouping.qudit_widths

        # Device-side symmetry tables (constants under jit).
        self.trans_tables = jnp.asarray(grouping.trans_tables)  # (Q, S, D)
        self.mask_tables = jnp.asarray(grouping.mask_tables)  # (Q, S, D)
        self.start_memo_idx = int(grouping.start_memo_idx)

        # Pad mask for the (possibly narrower) last qudit.
        pad = np.zeros((self.qudit_num, self.max_dim), dtype=bool)
        for q, dim in enumerate(grouping.qudit_dims):
            pad[q, :dim] = True
        self.pad_masks = jnp.asarray(pad)

        # Device-side qudit geometry for lax.scan over qudits.
        self.qudit_starts_arr = jnp.asarray(
            grouping.qudit_starts, dtype=jnp.int32
        )
        self.max_width = int(max(grouping.qudit_widths))

        # Per-qudit masked-unique flags (MU pattern): all-masked, except a
        # DU tail of length masking_depth; masking_mode='unmasked' is the
        # all-DU limit.
        mu = np.ones(self.qudit_num, dtype=bool)
        if self.config.masking_mode == "unmasked":
            mu[:] = False
        elif self.config.masking_depth:
            assert 0 <= self.config.masking_depth <= self.qudit_num
            mu[self.qudit_num - self.config.masking_depth:] = False
        self.mu_flags = jnp.asarray(mu)

        self.spin_flip_abs = self.config.spin_flip_abs
        self.spin_flip_phase = self.config.spin_flip_phase
        if self.spin_flip_abs or self.spin_flip_phase:
            assert sign_structure is None, (
                "sign_structure replaces the learned phase; combining it "
                "with spin-flip phase symmetrization is contradictory"
            )
            for s, w_ in zip(grouping.qudit_starts, grouping.qudit_widths):
                assert s % 2 == 0 and w_ % 2 == 0, (
                    "spin-flip symmetrization needs every qudit to hold "
                    "whole (alpha, beta) spin-orbital pairs: use an even "
                    "qubit_per_qudit"
                )
            # Local continuation index under the alpha<->beta bit-pair swap.
            idx = np.arange(self.max_dim, dtype=np.int64)
            flip_idx = ((idx & 0x55555555) << 1) | ((idx & 0xAAAAAAAA) >> 1)
            self.sf_cont_idx = jnp.asarray(flip_idx, dtype=jnp.int32)

        n_ch = 2 if self.config.head_mode == "log_psi" else 1
        base_kwargs = dict(
            qubit_num=self.qubit_num,
            qudit_starts=grouping.qudit_starts,
            qudit_ends=grouping.qudit_ends,
            max_qudit_dim=self.max_dim,
            compute_dtype=self.config.compute_dtype,
        )
        if self.config.net_type == "nade":
            from .nade import NadeSpec, nade_apply, nade_init

            nade_kwargs = dict(
                activation=self.config.activation,
                bias=self.config.bias,
                residual=self.config.residual,
                **base_kwargs,
            )
            self.main_spec = NadeSpec(
                hidden_widths=tuple(self.config.hidden_widths),
                n_channels=n_ch,
                **nade_kwargs,
            )
            self.aux_spec = (
                NadeSpec(
                    hidden_widths=tuple(self.config.aux_hidden_widths),
                    n_channels=1,
                    **nade_kwargs,
                )
                if self.config.head_mode == "log_abs_phase"
                else None
            )
            self._net_init, self._net_apply = nade_init, nade_apply
        elif self.config.net_type == "made":
            mlp_kwargs = dict(
                activation=self.config.activation,
                bias=self.config.bias,
                residual=self.config.residual,
                **base_kwargs,
            )
            self.main_spec = MadeSpec(
                hidden_widths=tuple(self.config.hidden_widths),
                n_channels=n_ch,
                **mlp_kwargs,
            )
            self.aux_spec = (
                MadeSpec(
                    hidden_widths=tuple(self.config.aux_hidden_widths),
                    n_channels=1,
                    **mlp_kwargs,
                )
                if self.config.head_mode == "log_abs_phase"
                else None
            )
            self._net_init, self._net_apply = made_init, made_apply
        elif self.config.net_type == "transformer":
            from .transformer import (
                TransformerSpec,
                transformer_apply,
                transformer_init,
            )

            tf_kwargs = dict(
                d_model=self.config.d_model,
                n_heads=self.config.n_heads,
                n_layers=self.config.n_layers,
                d_ff=self.config.d_ff,
                **base_kwargs,
            )
            self.main_spec = TransformerSpec(n_channels=n_ch, **tf_kwargs)
            self.aux_spec = (
                TransformerSpec(n_channels=1, **tf_kwargs)
                if self.config.head_mode == "log_abs_phase"
                else None
            )
            self._net_init, self._net_apply = (
                transformer_init,
                transformer_apply,
            )
        else:
            raise ValueError(self.config.net_type)

        if self.config.matmul_precision:
            raw_apply = self._net_apply
            prec = str(self.config.matmul_precision)

            def _apply_pinned(spec, params, x, _raw=raw_apply, _p=prec):
                with jax.default_matmul_precision(_p):
                    return _raw(spec, params, x)

            self._net_apply = _apply_pinned

    # ------------------------------------------------------------------
    def init(self, key) -> Dict:
        k1, k2 = jax.random.split(key)
        params = {"main": self._net_init(self.main_spec, k1)}
        if self.aux_spec is not None:
            params["aux"] = self._net_init(self.aux_spec, k2)
        return params

    # ------------------------------------------------------------------
    def normalize_cond(self, cond, mask):
        """Mask + normalize so sum_d exp(2*cond[d]) = 1 over valid slots."""
        if self.config.subtract_mean:
            cond = cond - jnp.mean(cond, axis=-1, keepdims=True)
        cond = jnp.where(mask, cond, NEG)
        norm = 0.5 * jax.nn.logsumexp(2.0 * cond, axis=-1, keepdims=True)
        cond = cond - norm
        return jnp.maximum(jnp.nan_to_num(cond, nan=NEG, neginf=NEG), NEG)

    def memo_path(self, words):
        """Packed states (B, W) -> per-qudit (memo_idx, mask) along the path.

        Returns (memo_path (B, Q) int32, masks (B, Q, D) bool): the memo index
        *entering* each qudit and the continuation mask at that point.
        """
        b = words.shape[0]
        memo = jnp.full((b,), self.start_memo_idx, dtype=jnp.int32)
        memos, masks = [], []
        for q in range(self.qudit_num):
            memos.append(memo)
            masks.append(self.mask_tables[q][memo])
            v = bitops.get_bit_range(
                words, self.qudit_starts[q], self.qudit_widths[q]
            )
            memo = self.trans_tables[q][memo, v]
        return jnp.stack(memos, 1), jnp.stack(masks, 1)

    def qudit_values(self, words):
        """(B, W) -> (B, Q) int32 qudit values."""
        vals = [
            bitops.get_bit_range(
                words, self.qudit_starts[q], self.qudit_widths[q]
            )
            for q in range(self.qudit_num)
        ]
        return jnp.stack(vals, 1)

    # ------------------------------------------------------------------
    def log_psi(self, params, words) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Packed states (B, W) -> (log_abs (B,), phase (B,))."""
        la_raw = self.main_log_abs_raw(params, words)
        _, masks = self.memo_path(words)
        masks = masks | ~self.mu_flags[None, :, None]  # DU qudits unmasked
        masks = masks & self.pad_masks[None]
        cond = self.normalize_cond(la_raw, masks)
        vals = self.qudit_values(words)
        la = jnp.take_along_axis(cond, vals[..., None], axis=-1)[..., 0]

        ph_raw = self._phase_raw(params, words)
        ph = jnp.take_along_axis(ph_raw, vals[..., None], axis=-1)[..., 0]
        phase = jnp.sum(ph, -1)
        if self.spin_flip_phase:
            # Symmetrized phase + fermionic reordering sign on the
            # non-canonical member of each {x, flip x} orbit (reference
            # abstract_anqs.py:466-474): reversing the n_open open-shell
            # electrons costs parity n_open*(n_open-1)/2 == n_open//2 (mod 2).
            flipped = bitops.interleave_swap(words, self.qubit_num)
            ph_raw_f = self._phase_raw(params, flipped)
            vals_f = self.qudit_values(flipped)
            ph_f = jnp.take_along_axis(
                ph_raw_f, vals_f[..., None], axis=-1
            )[..., 0]
            phase_f = jnp.sum(ph_f, -1)
            from ..ops import keys as _keys

            n_diff = bitops.popcount(words ^ flipped)
            pi_mult = ((n_diff // 4) % 2).astype(jnp.float32)
            is_cano = ~_keys.lex_less(words, flipped)  # x >= flip(x)
            phase = 0.5 * (phase + phase_f) + jnp.pi * jnp.where(
                is_cano, 0.0, pi_mult
            )
        if self.sign_structure is not None:
            flat = (
                words[..., 0] & jnp.uint32(2**self.qubit_num - 1)
            ).astype(jnp.int32)
            phase = self.sign_structure[flat]
        return jnp.maximum(jnp.sum(la, -1), NEG), phase

    def amplitude(self, params, words):
        """Complex amplitudes as a (re, im) pair of float32 arrays."""
        la, ph = self.log_psi(params, words)
        mag = jnp.exp(la)
        return mag * jnp.cos(ph), mag * jnp.sin(ph)

    def main_log_abs_raw(self, params, words):
        """Main-net conditionals only -- the sampler path skips the phase
        net entirely (reference cond_log_abs, log_abs_phase_anqs.py:106-163).
        Returns raw (B, Q, D) log-abs before masking/normalization.

        With ``spin_flip_abs`` the conditional is averaged with the
        flip-reindexed conditional of the spin-flipped prefix (reference
        abstract_anqs.py:320-326): cond'(c|p) = (cond(c|p) +
        cond(flip c|flip p)) / 2, which makes |psi| exactly flip-invariant.
        """
        x = bitops.unpack(words, self.qubit_num, dtype=jnp.float32)
        la = self._net_apply(self.main_spec, params["main"], x)[..., 0]
        if self.spin_flip_abs:
            xf = bitops.unpack(
                bitops.interleave_swap(words, self.qubit_num),
                self.qubit_num,
                dtype=jnp.float32,
            )
            la_f = self._net_apply(self.main_spec, params["main"], xf)[..., 0]
            la = 0.5 * (la + jnp.take(la_f, self.sf_cont_idx, axis=-1))
        cap = self.config.logit_cap
        if cap:
            la = cap * jnp.tanh(la / cap)
        return la

    def _phase_raw(self, params, words):
        """Raw per-continuation phases (B, Q, D) of ``words``."""
        x = bitops.unpack(words, self.qubit_num, dtype=jnp.float32)
        if self.config.head_mode == "log_psi":
            return self._net_apply(self.main_spec, params["main"], x)[..., 1]
        return jnp.pi * self._net_apply(
            self.aux_spec, params["aux"], x
        )[..., 0]

    def cond_for_qudit(self, params, words, q: int, mask):
        """Masked+normalized conditional log-abs for qudit ``q``.

        ``words`` hold the prefix (bits at qudits >= q are zero / ignored by
        causality). Used by the samplers, which track the memo themselves.
        """
        la_raw = self.main_log_abs_raw(params, words)
        mask = mask & self.pad_masks[q][None]
        return self.normalize_cond(la_raw[:, q], mask)

    def cond_for_qudit_dyn(self, params, words, q, mask, alive=None):
        """``cond_for_qudit`` with a *traced* qudit index ``q`` -- the
        lax.scan form used by the samplers (one traced network forward for
        the whole ancestral loop instead of Q unrolled copies).

        ``alive`` (optional (B,) bool) marks live frontier rows; DU qudits
        (mu_flags False) drop the symmetry mask but keep alive gating.
        """
        la_raw = self.main_log_abs_raw(params, words)
        la_q = jnp.take(la_raw, q, axis=1)
        pad_q = jnp.take(self.pad_masks, q, axis=0)
        if alive is not None:
            mu_q = jnp.take(self.mu_flags, q)
            mask = (mask | ~mu_q) & alive[:, None]
        return self.normalize_cond(la_q, mask & pad_q[None])
