"""Device-mesh helpers: data-parallel VMC over a TPU slice.

The reference is single-GPU with chunking knobs (SURVEY.md section 2
"Parallelism inventory"); the TPU-native scaling story is a ``Mesh`` with a
``data`` axis: the unique-determinant batch (sampler frontier, amplitude
evaluation, local energies, gradient accumulation) shards over rows, with XLA
GSPMD inserting the collectives (all-gather for the frontier top-k and the
sorted-join table, psum for estimators and grads).

Sharding is expressed as ``with_sharding_constraint`` annotations inside the
jitted train step, so the same code runs single-chip (mesh=None) and
multi-chip without branching.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(devices, (axis,))


def shard_rows(x, mesh: Optional[Mesh], axis: str = "data"):
    """Constrain the leading axis of every array in ``x`` to the mesh axis."""
    if mesh is None or mesh.size == 1:
        return x

    def constrain(a):
        if not hasattr(a, "ndim") or a.ndim == 0:
            return a
        spec = P(axis, *([None] * (a.ndim - 1)))
        return jax.lax.with_sharding_constraint(
            a, NamedSharding(mesh, spec)
        )

    return jax.tree_util.tree_map(constrain, x)


def replicate(x, mesh: Optional[Mesh]):
    if mesh is None or mesh.size == 1:
        return x

    def constrain(a):
        if not hasattr(a, "ndim"):
            return a
        return jax.lax.with_sharding_constraint(
            a, NamedSharding(mesh, P())
        )

    return jax.tree_util.tree_map(constrain, x)
