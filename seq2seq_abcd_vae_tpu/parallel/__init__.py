"""Multi-chip parallelism over a jax.sharding.Mesh.

The reference has no distributed support at all (SURVEY.md section 2.4);
this layer is the TPU-native capability superset: data parallelism over
segments via NamedSharding, with gradients all-reduced by the XLA
collectives pjit inserts over ICI/DCN."""

from .mesh import (data_parallel_sharding, make_mesh, replicate,
                   shard_batch_arrays)

__all__ = ["make_mesh", "data_parallel_sharding", "replicate",
           "shard_batch_arrays"]
