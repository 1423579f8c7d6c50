"""NADE ansatz: one independent MLP per qudit over the visible prefix.

Counterpart of the reference NADE mode (reference: nqs/nqs/stochastic/
ansatzes/anqs/log_abs_phase_anqs.py:24-42 -- a ModuleList of per-qudit MLPs).
Causality comes from a static input mask (qudits >= q zeroed) instead of
weight masks; all Q subnet forwards run in one traced program.

Interface-compatible with ``made_apply``: apply(params, bits) ->
(B, Q, D, C).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .made import _ACTIVATIONS, activation_pattern, bias_pattern


@dataclasses.dataclass(frozen=True)
class NadeSpec:
    qubit_num: int
    qudit_starts: Tuple[int, ...]
    qudit_ends: Tuple[int, ...]
    max_qudit_dim: int
    hidden_widths: Tuple[int, ...] = (64,)
    n_channels: int = 1
    activation: object = "tanh"  # str | Tuple[str, ...] | 'sanqs_paper'
    bias: object = True  # bool | Tuple[bool, ...] (depth+1 entries)
    residual: bool = True
    compute_dtype: str = "float32"

    @property
    def qudit_num(self) -> int:
        return len(self.qudit_starts)


def nade_init(spec: NadeSpec, key) -> Dict:
    params = {}
    out_dim = spec.max_qudit_dim * spec.n_channels
    use_bias = bias_pattern(spec.bias, len(spec.hidden_widths) + 1)
    for q in range(spec.qudit_num):
        dims = [spec.qubit_num, *spec.hidden_widths, out_dim]
        sub = {}
        for i in range(len(dims) - 1):
            key, k = jax.random.split(key)
            scale = math.sqrt(2.0 / (dims[i] + dims[i + 1]))
            sub[f"w{i}"] = scale * jax.random.normal(
                k, (dims[i], dims[i + 1]), dtype=jnp.float32
            )
            if use_bias[i]:
                sub[f"b{i}"] = jnp.zeros(
                    (dims[i + 1],), dtype=jnp.float32
                )
        params[f"qudit{q}"] = sub
    return params


def nade_apply(spec: NadeSpec, params: Dict, bits):
    """bits (B, n) in {0,1} -> (B, Q, D, C)."""
    n_layers = len(spec.hidden_widths)
    acts = activation_pattern(spec.activation, n_layers)
    cdt = jnp.dtype(spec.compute_dtype)
    x_full = 1.0 - 2.0 * bits.astype(jnp.float32)
    outs = []
    for q in range(spec.qudit_num):
        vis = np.zeros(spec.qubit_num, dtype=np.float32)
        vis[: spec.qudit_starts[q]] = 1.0
        h = (x_full * vis).astype(cdt)
        sub = params[f"qudit{q}"]
        for i in range(n_layers):
            z = jnp.dot(
                h, sub[f"w{i}"].astype(cdt),
                preferred_element_type=jnp.float32,
            )
            if f"b{i}" in sub:
                z = z + sub[f"b{i}"]
            z = _ACTIVATIONS[acts[i]](z)
            if spec.residual and i > 0 and z.shape == h.shape:
                z = z + h
            h = z.astype(cdt)
        out = jnp.dot(
            h, sub[f"w{n_layers}"].astype(cdt),
            preferred_element_type=jnp.float32,
        )
        if f"b{n_layers}" in sub:
            out = out + sub[f"b{n_layers}"]
        outs.append(out)
    out = jnp.stack(outs, axis=1)
    return out.reshape(
        *bits.shape[:-1], spec.qudit_num, spec.max_qudit_dim, spec.n_channels
    )
