"""Device mesh construction and sharding rules.

Single knob: a 2D mesh ('data', 'model').  Data parallelism shards the batch
over 'data' (XLA inserts psum grad reduces over ICI); 'model' is available
for tensor-style sharding of the pointwise matmul channels on larger
variants.  Multi-host: jax.distributed.initialize() is called by the CLI
when JAX reports multiple processes; when the 'data' axis crosses
processes each host feeds its own feeder shard, and when it doesn't
(pure TP/seqpar, mesh [1, N]) every host feeds the identical full batch
— see shard_batch for the two assembly paths.
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


def shard_batch(mesh: Mesh, batch, specs=None, *,
                replicated_batch: bool = False):
    """Device-put a host batch dict with the batch axis sharded on 'data'.

    ``specs``: optional per-key PartitionSpec overrides (e.g. the
    sequence-parallel trainer places 'data' as P('data', None, 'model')
    so the transfer lands already T-sharded instead of paying a per-step
    reshard inside the jit).

    Multi-process (jax.process_count() > 1), two layouts:

    - ``replicated_batch=False`` (the 'data' mesh axis crosses
      processes): each process passes its OWN host shard (the feeder's
      host-sharded local batch) and the result is one global jax.Array
      whose leading axis is the concatenation of the per-process shards
      in process order — the global batch the jitted step sees.  Spec
      overrides are honored as long as their leading axis stays 'data'
      (jax.make_array_from_process_local_data assembles the
      within-process minor-axis sharding, e.g. seqpar's T shards).
    - ``replicated_batch=True`` (the 'data' axis does not cross
      processes, e.g. pure tensor/sequence parallelism on a [1, N]
      mesh): every process holds the IDENTICAL full batch (the feeders
      run unsharded off one seed); the global shape equals the local
      shape and each process contributes the shards it addresses.

    Both multi-process layouts go through
    jax.make_array_from_process_local_data — NOT device_put: a
    cross-process device_put issued from the prefetch worker thread
    deadlocks against in-flight collective executions on the gloo CPU
    backend (probe6/probe7, scratch/), while the local-shard assembly
    path is safe to pipeline.
    """
    default = batch_sharding(mesh)
    if jax.process_count() > 1:
        factor = 1 if replicated_batch else jax.process_count()

        def put(a, sh=default):
            a = np.asarray(a)
            global_shape = (a.shape[0] * factor,) + a.shape[1:]
            return jax.make_array_from_process_local_data(
                sh, a, global_shape)

        if specs is None:
            return jax.tree_util.tree_map(put, batch)
        if not isinstance(batch, dict):
            raise TypeError(
                "shard_batch with specs expects a dict batch keyed "
                "like specs")
        if not replicated_batch:
            # per-process host shards concatenate along the leading axis;
            # a spec that moved it elsewhere would interleave wrongly
            # (replicated mode has the full array on every host, so any
            # spec slices correctly)
            for k, spec in specs.items():
                if spec and spec[0] != "data":
                    raise NotImplementedError(
                        f"multi-process spec override for {k!r} must "
                        f"keep the leading axis on 'data' (got {spec})")
        return {
            k: jax.tree_util.tree_map(
                lambda a, s=(NamedSharding(mesh, specs[k])
                             if k in specs else default):
                put(a, s), v)
            for k, v in batch.items()
        }
    if specs is None:
        return jax.tree_util.tree_map(
            lambda a: jax.device_put(a, default), batch)
    if not isinstance(batch, dict):
        raise TypeError(
            "shard_batch with specs expects a dict batch keyed like specs")
    return {
        k: jax.tree_util.tree_map(
            lambda a, s=(NamedSharding(mesh, specs[k])
                         if k in specs else default):
            jax.device_put(a, s), v)
        for k, v in batch.items()
    }


# ---------------------------------------------------------------------------
# Tensor-parallel parameter sharding rules
# ---------------------------------------------------------------------------


def param_spec(path, leaf) -> P:
    """Partition rule for one parameter leaf, keyed off its state-dict path.

    The TP axis shards the output channels of the two hot matmuls:
    - ``Linear_weight`` (C_in, C_out) -> P(..., 'model') — the spatial
      pointwise matmul (reference einsum nwc,cd->nwd, model/shift_gcn.py:131),
    - ``temporal_linear.weight`` (C_out, C_in, 1, 1) -> P('model', ...) —
      the temporal 1x1 conv (model/shift_gcn.py:53).
    Works for both plain and fourstream (stream-stacked, one extra leading
    axis) parameter pytrees; everything else is replicated and XLA's SPMD
    partitioner propagates the activation shardings + collectives.
    """
    keys = [str(getattr(k, "key", "")) for k in path]
    name = ".".join(keys)
    if "Linear_weight" in name and leaf.ndim >= 2:
        spec = [None] * leaf.ndim
        spec[-1] = "model"
        return P(*spec)
    if name.endswith("temporal_linear.weight") and leaf.ndim >= 4:
        spec = [None] * leaf.ndim
        spec[leaf.ndim - 4] = "model"
        return P(*spec)
    return P()


def state_shardings(mesh: Mesh, state):
    """NamedSharding pytree for a TrainState: TP rules on params (and the
    momentum buffer, which mirrors params), everything else replicated."""
    params_sh = jax.tree_util.tree_map_with_path(
        lambda p, l: NamedSharding(mesh, param_spec(p, l)), state.params)
    repl = NamedSharding(mesh, P())
    return type(state)(
        params=params_sh,
        bn_state=jax.tree_util.tree_map(lambda _: repl, state.bn_state),
        opt_state=type(state.opt_state)(
            momentum_buf=params_sh,
            initialized=repl,
        ),
        global_step=repl,
    )
