"""MADE masked MLP over qudits (functional, pure-pytree parameters).

The reference mutates ``weight.data`` with causal masks inside forward
(reference: nqs/nqs/stochastic/ansatzes/anqs/mlp.py:166-243); here masks are
static constants multiplied functionally (``w_eff = w * mask``), which is both
correct under jax transforms and XLA-fusable. One forward pass yields the
conditional distributions of every qudit at once; causality over qudit blocks
makes output q independent of inputs at qudits >= q.

Dtype policy: parameters and activations are float32 (TPU-native); the
optional ``compute_dtype=bfloat16`` path casts matmul inputs only.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class MadeSpec:
    qubit_num: int
    qudit_starts: Tuple[int, ...]  # qudit block boundaries over qubits
    qudit_ends: Tuple[int, ...]
    max_qudit_dim: int  # D: outputs per qudit (2**max width)
    hidden_widths: Tuple[int, ...] = (512,)
    n_channels: int = 1  # output channels (e.g. 2 for complex log-psi)
    activation: str = "tanh"
    residual: bool = True
    compute_dtype: str = "float32"

    @property
    def qudit_num(self) -> int:
        return len(self.qudit_starts)

    @property
    def out_dim(self) -> int:
        return self.qudit_num * self.max_qudit_dim * self.n_channels


def _degrees(spec: MadeSpec):
    """Input qudit-ids, per-hidden-layer degrees, output qudit-ids."""
    q_in = np.concatenate(
        [
            np.full(e - s, q, dtype=np.int32)
            for q, (s, e) in enumerate(
                zip(spec.qudit_starts, spec.qudit_ends)
            )
        ]
    )
    n_deg = max(spec.qudit_num - 1, 1)
    hidden_degs = [
        np.arange(w, dtype=np.int32) % n_deg for w in spec.hidden_widths
    ]
    q_out = np.repeat(
        np.arange(spec.qudit_num, dtype=np.int32),
        spec.max_qudit_dim * spec.n_channels,
    )
    return q_in, hidden_degs, q_out


def made_masks(spec: MadeSpec):
    """Static 0/1 causal masks for each layer, as float32 numpy arrays."""
    q_in, hidden_degs, q_out = _degrees(spec)
    masks = []
    prev = q_in
    for degs in hidden_degs:
        masks.append((prev[:, None] <= degs[None, :]).astype(np.float32))
        prev = degs
    # Output connects to hidden with degree < its qudit id (strict causality).
    masks.append((prev[:, None] < q_out[None, :]).astype(np.float32))
    return masks


def made_init(spec: MadeSpec, key) -> Dict:
    """Glorot-initialized parameters; biases zero."""
    dims = [spec.qubit_num, *spec.hidden_widths, spec.out_dim]
    params = {}
    for i in range(len(dims) - 1):
        key, sub = jax.random.split(key)
        scale = math.sqrt(2.0 / (dims[i] + dims[i + 1]))
        params[f"w{i}"] = scale * jax.random.normal(
            sub, (dims[i], dims[i + 1]), dtype=jnp.float32
        )
        params[f"b{i}"] = jnp.zeros((dims[i + 1],), dtype=jnp.float32)
    return params


_ACTIVATIONS = {
    "tanh": jnp.tanh,
    "relu": jax.nn.relu,
    "gelu": jax.nn.gelu,
    "leaky_relu": lambda x: jax.nn.leaky_relu(x, 0.01),
    "silu": jax.nn.silu,
}


def made_apply(spec: MadeSpec, params: Dict, bits) -> jnp.ndarray:
    """bits (B, n) in {0,1} -> (B, Q, D, C) raw conditional outputs.

    Input encoding x -> 1 - 2x (the +-1 convention; causality makes the
    "unseen suffix" encoding irrelevant for the autoregressive outputs).
    """
    masks = made_masks(spec)
    act = _ACTIVATIONS[spec.activation]
    cdt = jnp.dtype(spec.compute_dtype)

    h = (1.0 - 2.0 * bits.astype(jnp.float32)).astype(cdt)
    n_layers = len(spec.hidden_widths)
    for i in range(n_layers):
        w_eff = (params[f"w{i}"] * masks[i]).astype(cdt)
        z = (
            jnp.dot(h, w_eff, preferred_element_type=jnp.float32)
            + params[f"b{i}"]
        )
        z = act(z)
        if spec.residual and i > 0 and z.shape == h.shape:
            z = z + h
        h = z.astype(cdt)
    w_eff = (params[f"w{n_layers}"] * masks[n_layers]).astype(cdt)
    out = (
        jnp.dot(h, w_eff, preferred_element_type=jnp.float32)
        + params[f"b{n_layers}"]
    )
    return out.reshape(
        *bits.shape[:-1],
        spec.qudit_num,
        spec.max_qudit_dim,
        spec.n_channels,
    )
