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
    # Per-layer patterns (reference PatternConfig family, mlp.py:13-70):
    # a plain value is the uniform pattern; a tuple gives one entry per
    # hidden layer (bias: per layer incl. the output layer, so depth+1);
    # activation='sanqs_paper' is the reference's non-uniform preset
    # (tanh, then leaky_relu on the remaining layers).
    activation: object = "tanh"  # str | Tuple[str, ...]
    bias: object = True  # bool | Tuple[bool, ...]
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


def activation_pattern(activation, depth: int) -> Tuple[str, ...]:
    """Resolve a uniform / per-layer / preset activation pattern.

    The reference expresses this as ActivationConfig(PatternConfig)
    (mlp.py:49-70): 'uniform' repeats one activation, 'sanqs_paper' is
    (Tanh, LeakyReLU, LeakyReLU, ...).
    """
    if activation == "sanqs_paper":
        return ("tanh",) + ("leaky_relu",) * max(depth - 1, 0)
    if isinstance(activation, str):
        return (activation,) * depth
    pattern = tuple(activation)
    assert len(pattern) == depth, (pattern, depth)
    return pattern


def bias_pattern(bias, depth_plus_1: int) -> Tuple[bool, ...]:
    """Per-layer bias on/off (reference BiasConfig, mlp.py:26-35;
    resolved at depth+1 -- hidden layers plus the output layer)."""
    if isinstance(bias, bool):
        return (bias,) * depth_plus_1
    pattern = tuple(bool(b) for b in bias)
    assert len(pattern) == depth_plus_1, (pattern, depth_plus_1)
    return pattern


def made_init(spec: MadeSpec, key) -> Dict:
    """Glorot-initialized parameters; biases zero (where enabled)."""
    dims = [spec.qubit_num, *spec.hidden_widths, spec.out_dim]
    use_bias = bias_pattern(spec.bias, len(dims) - 1)
    params = {}
    for i in range(len(dims) - 1):
        key, sub = jax.random.split(key)
        scale = math.sqrt(2.0 / (dims[i] + dims[i + 1]))
        params[f"w{i}"] = scale * jax.random.normal(
            sub, (dims[i], dims[i + 1]), dtype=jnp.float32
        )
        if use_bias[i]:
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
    n_layers = len(spec.hidden_widths)
    acts = activation_pattern(spec.activation, n_layers)
    cdt = jnp.dtype(spec.compute_dtype)

    h = (1.0 - 2.0 * bits.astype(jnp.float32)).astype(cdt)
    for i in range(n_layers):
        w_eff = (params[f"w{i}"] * masks[i]).astype(cdt)
        z = jnp.dot(h, w_eff, preferred_element_type=jnp.float32)
        if f"b{i}" in params:
            z = z + params[f"b{i}"]
        z = _ACTIVATIONS[acts[i]](z)
        if spec.residual and i > 0 and z.shape == h.shape:
            z = z + h
        h = z.astype(cdt)
    w_eff = (params[f"w{n_layers}"] * masks[n_layers]).astype(cdt)
    out = jnp.dot(h, w_eff, preferred_element_type=jnp.float32)
    if f"b{n_layers}" in params:
        out = out + params[f"b{n_layers}"]
    return out.reshape(
        *bits.shape[:-1],
        spec.qudit_num,
        spec.max_qudit_dim,
        spec.n_channels,
    )
