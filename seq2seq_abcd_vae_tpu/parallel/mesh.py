"""Mesh construction and sharding specs for data-parallel training.

Design (scaling-book recipe): pick a mesh, annotate input/param shardings,
let pjit/XLA insert the collectives.  For this model family the only
parallelism the workload motivates is data parallelism over segments
(SURVEY.md section 2.4): params/opt-state replicated, batches sharded on
axis 0 of a ('data',) mesh.  Gradient all-reduce rides ICI within a slice
(XLA inserts it because replicated outputs depend on sharded inputs).

The mesh helper accepts extra axes (('data','model')) as capability hooks;
at 3-6M params nothing needs them, and we deliberately do not shard the
parameters.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: int | None = None,
              devices=None, axis_name: str = "data") -> Mesh:
    if devices is None:
        devices = jax.devices()
        if num_devices is not None:
            devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def data_parallel_sharding(mesh: Mesh,
                           axis_name: str = "data") -> NamedSharding:
    """Batch arrays: sharded along axis 0."""
    return NamedSharding(mesh, P(axis_name))


def replicate(mesh: Mesh) -> NamedSharding:
    """Params / optimizer state / scalars: replicated."""
    return NamedSharding(mesh, P())


def shard_batch_arrays(mesh: Mesh, *arrays, axis_name: str = "data"):
    """Place host arrays so axis 0 is split across the mesh.

    Axis 0 must be divisible by the mesh size; the DataLoader's
    pad_to_batch_size guarantees this when batch_size % num_devices == 0.
    """
    sh = data_parallel_sharding(mesh, axis_name)
    out = []
    for a in arrays:
        if a.shape[0] % mesh.size != 0:
            raise ValueError(
                f"batch dim {a.shape[0]} not divisible by mesh size "
                f"{mesh.size}; pick batch_size as a multiple of the "
                "device count")
        out.append(jax.device_put(a, sh))
    return tuple(out)
