"""Pallas TPU kernels for the local-energy hot path.

``fused_matrix_elements`` fuses the two MXU matmuls of the matrix-element
pipeline (sign = 1 - 2*((bits(X) @ bits(B)) mod 2); ME = sign @ G) so the
(batch x term) sign matrix never round-trips through HBM -- it lives in VMEM
one (B_tile, T_tile) block at a time, with the (B_tile, M) output accumulated
across the T grid axis. This is the TPU-native replacement for the
reference's CUDA popcount + scatter-add matrix-element kernel
(reference: nqs/nqs/stochastic/observables/pauli_observable.py:255-324 and
nqs/nqs/utils/custom_popcount/cuda_int64popcount.py:12-87).

Weights arrive as 2-3 bf16 residual splits (see observables/pauli.py) so the
+-1 x bf16 products are exact and the f32 weight values are reconstructed to
full mantissa.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _hash_lookup_kernel(qlo_ref, qhi_ref, tab_ref, la_ref, ph_ref, f_ref):
    """One query tile: bucket-row gather from the VMEM-resident table,
    key-lane compare, amplitude-lane select."""
    nb = tab_ref.shape[0]
    qlo = qlo_ref[:]
    qhi = qhi_ref[:]
    acc = qlo * jnp.uint32(2654435761)
    acc = acc ^ (acc >> jnp.uint32(15))
    acc = (acc ^ qhi) * jnp.uint32(2654435761)
    acc = acc ^ (acc >> jnp.uint32(15))
    acc = acc * jnp.uint32(2246822519)
    acc = acc ^ (acc >> jnp.uint32(13))
    bucket = (acc & jnp.uint32(nb - 1)).astype(jnp.int32)

    rows = jnp.take(tab_ref[:], bucket, axis=0)  # (T, 128), planar layout
    keys_lo = jax.lax.bitcast_convert_type(rows[:, 0:32], jnp.uint32)
    keys_hi = jax.lax.bitcast_convert_type(rows[:, 32:64], jnp.uint32)
    la_e = rows[:, 64:96]
    neg = jnp.float32(-1e30)
    match = (
        (keys_lo == qlo[:, None])
        & (keys_hi == qhi[:, None])
        & (la_e > 0.5 * neg)
    )
    la_ref[:] = jnp.where(
        jnp.any(match, axis=-1),
        jnp.sum(jnp.where(match, la_e, 0.0), axis=-1),
        neg,
    )
    ph_ref[:] = jnp.sum(jnp.where(match, rows[:, 96:128], 0.0), axis=-1)
    f_ref[:] = jnp.any(match, axis=-1)


def hash_lookup(tab, q_lo, q_hi, tile: int = 1 << 15):
    """Fused bucket-hash membership lookup (experimental Pallas path).

    ``tab``: (nb, 128) f32 bucket rows as built by
    ``PauliEngine._proxy_via_hash`` (32 entries of (key_lo, key_hi,
    log|psi|, phase) bitcast lanes). ``q_lo``/``q_hi``: (N,) uint32 query
    key words. Returns (la_p, ph_p, found). The hash here MUST match
    ``_proxy_via_hash``'s (w == 2 form).
    """
    n = q_lo.shape[0]
    n_pad = _round_up(n, tile)
    qlo_p = jnp.zeros((n_pad,), jnp.uint32).at[:n].set(q_lo)
    qhi_p = jnp.zeros((n_pad,), jnp.uint32).at[:n].set(q_hi)
    la, ph, found = pl.pallas_call(
        _hash_lookup_kernel,
        grid=(n_pad // tile,),
        in_specs=[
            pl.BlockSpec((tile,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                tab.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec((tile,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile,), lambda i: (i,), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad,), jnp.float32),
            jax.ShapeDtypeStruct((n_pad,), jnp.float32),
            jax.ShapeDtypeStruct((n_pad,), jnp.bool_),
        ],
    )(qlo_p, qhi_p, tab)
    return la[:n], ph[:n], found[:n]


def _fused_me_kernel(x_ref, b_ref, g0_ref, g1_ref, g2_ref, out_ref):
    j = pl.program_id(1)
    p = jnp.dot(x_ref[:], b_ref[:], preferred_element_type=jnp.float32)
    sign = (1.0 - 2.0 * jnp.mod(p, 2.0)).astype(jnp.bfloat16)
    acc = jnp.dot(sign, g0_ref[:], preferred_element_type=jnp.float32)
    acc += jnp.dot(sign, g1_ref[:], preferred_element_type=jnp.float32)
    acc += jnp.dot(sign, g2_ref[:], preferred_element_type=jnp.float32)

    @pl.when(j == 0)
    def _():
        out_ref[:] = acc

    @pl.when(j != 0)
    def _():
        out_ref[:] = out_ref[:] + acc


@functools.partial(jax.jit, static_argnames=("b_tile", "t_tile"))
def fused_matrix_elements(
    x_bits,  # (B, n) bf16 0/1
    b_bits,  # (n, T) bf16 0/1
    g_splits: Tuple,  # 3 x (T, M) bf16 weight splits
    b_tile: int = 256,
    t_tile: int = 512,
):
    """Returns (B, M) f32 grouped matrix elements.

    Inputs must be pre-padded: n, T multiples of the tile constraints are
    handled here by zero-padding (padded bit columns meet zero weights).
    """
    b, n = x_bits.shape
    t = b_bits.shape[1]
    m = g_splits[0].shape[1]

    b_pad = _round_up(b, b_tile)
    n_pad = _round_up(n, 128)
    t_pad = _round_up(t, t_tile)
    m_pad = _round_up(m, 128)

    x_p = jnp.zeros((b_pad, n_pad), jnp.bfloat16).at[:b, :n].set(x_bits)
    bb_p = jnp.zeros((n_pad, t_pad), jnp.bfloat16).at[:n, :t].set(b_bits)
    g_p = [
        jnp.zeros((t_pad, m_pad), jnp.bfloat16).at[:t, :m].set(g)
        for g in g_splits
    ]
    while len(g_p) < 3:
        g_p.append(jnp.zeros((t_pad, m_pad), jnp.bfloat16))

    grid = (b_pad // b_tile, t_pad // t_tile)
    out = pl.pallas_call(
        _fused_me_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (b_tile, n_pad), lambda i, j: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (n_pad, t_tile), lambda i, j: (0, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (t_tile, m_pad), lambda i, j: (j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (t_tile, m_pad), lambda i, j: (j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (t_tile, m_pad), lambda i, j: (j, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (b_tile, m_pad), lambda i, j: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b_pad, m_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * t_pad * (n_pad + 3 * m_pad),
            bytes_accessed=(
                b_pad * n_pad * 2
                + n_pad * t_pad * 2
                + 3 * t_pad * m_pad * 2
                + b_pad * m_pad * 4
            ),
            transcendentals=0,
        ),
    )(x_p, bb_p, g_p[0], g_p[1], g_p[2])
    return out[:b, :m]
