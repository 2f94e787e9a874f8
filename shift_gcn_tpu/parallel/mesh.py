"""Device mesh construction and sharding rules.

Single knob: a 2D mesh ('data', 'model').  Data parallelism shards the batch
over 'data' (XLA inserts psum grad reduces over ICI); 'model' is available
for tensor-style sharding of the pointwise matmul channels on larger
variants.  Multi-host: jax.distributed.initialize() is called by the CLI
when JAX reports multiple processes; each host feeds its own batch shard via
the feeder's host sharding.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(mesh_shape: Optional[Sequence[int]] = None,
              devices=None) -> Mesh:
    """Build a ('data', 'model') mesh. Default: all devices on 'data'."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if mesh_shape is None:
        mesh_shape = (n, 1)
    data, model = mesh_shape
    if data * model != n:
        raise ValueError(
            f"mesh_shape {mesh_shape} does not cover {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a host batch dict with the batch axis sharded on 'data'."""
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda a: jax.device_put(a, sharding), batch)
