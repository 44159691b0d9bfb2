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


def process_row_range(mesh: Mesh, global_rows: int) -> tuple[int, int]:
    """The [lo, hi) slice of batch rows owned by this process.

    Requires the mesh device order to be process-grouped (jax.devices()
    default: devices sorted so each process's devices are contiguous),
    so each process owns one contiguous row block.
    """
    procs = [d.process_index for d in mesh.devices.flat]
    if procs != sorted(procs):
        raise ValueError("mesh devices are not process-contiguous; "
                         "build the mesh from jax.devices() order")
    n_proc = jax.process_count()
    if global_rows % mesh.size != 0:
        raise ValueError(f"batch dim {global_rows} not divisible by mesh "
                         f"size {mesh.size}")
    rows_per_proc = global_rows // n_proc
    pid = jax.process_index()
    return pid * rows_per_proc, (pid + 1) * rows_per_proc


def shard_batch_arrays_multihost(mesh: Mesh, global_rows: int, *local_arrays,
                                 axis_name: str = "data"):
    """Assemble global on-device batch arrays from process-local rows.

    Each ``local_arrays[i]`` holds only this process's row block (see
    ``process_row_range``); ``jax.make_array_from_process_local_data``
    stitches the global jax.Array without any host gathering — the
    cross-host exchange happens only where XLA inserts collectives.
    """
    sh = data_parallel_sharding(mesh, axis_name)
    out = []
    for a in local_arrays:
        global_shape = (global_rows,) + a.shape[1:]
        out.append(jax.make_array_from_process_local_data(sh, a,
                                                          global_shape))
    return tuple(out)


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
