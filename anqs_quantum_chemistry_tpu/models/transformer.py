"""Causal transformer ansatz over qudit tokens.

Counterpart of the reference TransformerMADE (reference: nqs/nqs/stochastic/
ansatzes/legacy/anqs_primitives/made/transformer_made.py:9-48 and its wrapper
legacy/made/real_log_psi_transformer_made.py:14-135), redesigned: tokens are
*qudits* (64-way) rather than qubits, a learned start token shifts the
sequence right so position q attends only to qudits < q, and the output head
emits (D, C) conditional channels per position. Sequence length = qudit_num
(<= ~17 for every molecule in scope) -- the batch axis carries all the
parallelism, which is the TPU-friendly regime.

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

from ..ops import bits as bitops


@dataclasses.dataclass(frozen=True)
class TransformerSpec:
    qubit_num: int
    qudit_starts: Tuple[int, ...]
    qudit_ends: Tuple[int, ...]
    max_qudit_dim: int
    n_channels: int = 1
    d_model: int = 64
    n_heads: int = 4
    n_layers: int = 2
    d_ff: int = 256
    compute_dtype: str = "float32"

    @property
    def qudit_num(self) -> int:
        return len(self.qudit_starts)


def transformer_init(spec: TransformerSpec, key) -> Dict:
    q = spec.qudit_num
    d = spec.d_model
    params = {}
    keys = jax.random.split(key, 4 + 8 * spec.n_layers)
    it = iter(keys)

    def glorot(k, shape):
        scale = math.sqrt(2.0 / (shape[-2] + shape[-1]))
        return scale * jax.random.normal(k, shape, dtype=jnp.float32)

    # Token embedding: each qudit value embeds via a per-position table
    # (value one-hot x d_model); plus learned positions and a start token.
    params["embed"] = glorot(next(it), (q, spec.max_qudit_dim, d))
    params["pos"] = 0.02 * jax.random.normal(
        next(it), (q, d), dtype=jnp.float32
    )
    params["start"] = 0.02 * jax.random.normal(
        next(it), (d,), dtype=jnp.float32
    )
    for layer in range(spec.n_layers):
        p = {}
        p["wq"] = glorot(next(it), (d, d))
        p["wk"] = glorot(next(it), (d, d))
        p["wv"] = glorot(next(it), (d, d))
        p["wo"] = glorot(next(it), (d, d))
        p["ln1_scale"] = jnp.ones((d,), jnp.float32)
        p["ln1_bias"] = jnp.zeros((d,), jnp.float32)
        p["ln2_scale"] = jnp.ones((d,), jnp.float32)
        p["ln2_bias"] = jnp.zeros((d,), jnp.float32)
        p["ff1"] = glorot(next(it), (d, spec.d_ff))
        p["ff1_b"] = jnp.zeros((spec.d_ff,), jnp.float32)
        p["ff2"] = glorot(next(it), (spec.d_ff, d))
        p["ff2_b"] = jnp.zeros((d,), jnp.float32)
        params[f"layer{layer}"] = p
    params["head"] = glorot(
        next(it), (d, spec.max_qudit_dim * spec.n_channels)
    )
    params["head_b"] = jnp.zeros(
        (spec.max_qudit_dim * spec.n_channels,), jnp.float32
    )
    return params


def _layer_norm(x, scale, bias, eps=1e-5):
    mu = jnp.mean(x, -1, keepdims=True)
    var = jnp.var(x, -1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * scale + bias


def transformer_apply(spec: TransformerSpec, params: Dict, bits):
    """bits (B, n) in {0,1} -> (B, Q, D, C) conditional outputs."""
    b = bits.shape[0]
    q_num = spec.qudit_num
    d = spec.d_model
    cdt = jnp.dtype(spec.compute_dtype)

    # Qudit values from bit columns (static per-qudit slices).
    vals = []
    for qi, (s, e) in enumerate(zip(spec.qudit_starts, spec.qudit_ends)):
        pows = jnp.asarray(
            [1 << j for j in range(e - s)], dtype=jnp.int32
        )
        vals.append(
            jnp.sum(bits[:, s:e].astype(jnp.int32) * pows, axis=-1)
        )
    vals = jnp.stack(vals, 1)  # (B, Q)

    # Embed + shift right with the start token: position q sees qudits < q.
    emb = jnp.take_along_axis(
        params["embed"][None],  # (1, Q, D, d)
        vals[:, :, None, None].astype(jnp.int32),
        axis=2,
    )[:, :, 0, :]  # (B, Q, d)
    h = jnp.concatenate(
        [
            jnp.broadcast_to(params["start"][None, None], (b, 1, d)),
            emb[:, : q_num - 1],
        ],
        axis=1,
    )
    h = (h + params["pos"][None]).astype(cdt)

    causal = jnp.tril(jnp.ones((q_num, q_num), dtype=bool))
    n_heads = spec.n_heads
    d_head = d // n_heads
    for layer in range(spec.n_layers):
        p = params[f"layer{layer}"]
        x = _layer_norm(h.astype(jnp.float32), p["ln1_scale"], p["ln1_bias"])
        x = x.astype(cdt)

        def proj(w):
            return jnp.einsum(
                "bqd,de->bqe", x, w.astype(cdt),
                preferred_element_type=jnp.float32,
            ).reshape(b, q_num, n_heads, d_head)

        qh, kh, vh = proj(p["wq"]), proj(p["wk"]), proj(p["wv"])
        logits = jnp.einsum(
            "bqhe,bkhe->bhqk", qh, kh, preferred_element_type=jnp.float32
        ) / math.sqrt(d_head)
        logits = jnp.where(causal[None, None], logits, -1e30)
        attn = jax.nn.softmax(logits, axis=-1)
        ctx = jnp.einsum(
            "bhqk,bkhe->bqhe", attn.astype(cdt), vh,
            preferred_element_type=jnp.float32,
        ).reshape(b, q_num, d)
        h = h.astype(jnp.float32) + jnp.einsum(
            "bqd,de->bqe", ctx.astype(cdt), p["wo"].astype(cdt),
            preferred_element_type=jnp.float32,
        )

        x = _layer_norm(h, p["ln2_scale"], p["ln2_bias"]).astype(cdt)
        ff = jax.nn.gelu(
            jnp.einsum(
                "bqd,df->bqf", x, p["ff1"].astype(cdt),
                preferred_element_type=jnp.float32,
            )
            + p["ff1_b"]
        )
        h = h + jnp.einsum(
            "bqf,fd->bqd", ff.astype(cdt), p["ff2"].astype(cdt),
            preferred_element_type=jnp.float32,
        ) + p["ff2_b"]

    out = (
        jnp.einsum(
            "bqd,do->bqo", h.astype(cdt), params["head"].astype(cdt),
            preferred_element_type=jnp.float32,
        )
        + params["head_b"]
    )
    return out.reshape(b, q_num, spec.max_qudit_dim, spec.n_channels)
