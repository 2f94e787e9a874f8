"""Node-sharded GNN family — the launchable home of the `ring` edge
strategy.

The skeleton families (shift_gcn, stgcn) never need node sharding: V is
25/33, so replicating node features along the edge axis is free and the
`gather` strategy wins (docs/DESIGN.md, composition boundaries).  The
ring strategy exists for graphs too LARGE to replicate — this family is
that regime made launchable: a configurable synthetic large-V graph
(deterministic from config) with a simple aggregate→project GNN stack
whose node features stay sharded across the mesh end to end.  Training
with `edge_partition: true` + `edge_strategy: ring` runs every layer's
aggregation as the P-1-step ppermute ring of
`parallel.edge_partition.ring_aggregate` — boundary exchange overlapped
with local segment-sums, O(V/P) node memory per device, no final psum —
the BASELINE.json north-star mechanism as a config-launchable trainer
mode (verified equal to the dense unsharded step,
tests/test_ring_training.py).

Data contract: standard feeder clips (N, C, T, V, M) with T = M = 1 —
each "clip" is one (V, C) node-feature frame — so the whole
Feeder/BatchIterator/Trainer/checkpoint stack works unchanged
(scripts/make_ring_data.py generates a separable synthetic dataset).

Reference lineage: the reference has no large-graph mode at all (its one
graph op is the V=25 index_select at model/shift_gcn.py:127); this family
is the scaling capability BASELINE.json's north star asks the rebuild to
add, not a port.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from shift_gcn_tpu.ops.aggregate import edge_aggregate

Params = Dict[str, Any]
State = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class RingGNNConfig:
    num_class: int = 2
    num_nodes: int = 256
    in_channels: int = 8
    hidden: Tuple[int, ...] = (32, 32)
    # synthetic digraph: a stride ring guaranteeing cross-shard edges
    # plus `extra_edges` random edges, deterministic from graph_seed
    graph_seed: int = 3
    extra_edges: int = 512


def synthetic_graph(config: RingGNNConfig) -> Dict[str, np.ndarray]:
    """Deterministic sparse digraph over num_nodes (COO, weighted)."""
    v = config.num_nodes
    rng = np.random.default_rng(config.graph_seed)
    src = np.arange(v, dtype=np.int32)
    dst = ((src * 9 + 5) % v).astype(np.int32)
    extra = rng.integers(0, v, (2, config.extra_edges)).astype(np.int32)
    n_e = v + config.extra_edges
    return {
        "src": np.concatenate([src, extra[0]]),
        "dst": np.concatenate([dst, extra[1]]),
        "weight": rng.uniform(0.5, 1.5, n_e).astype(np.float32),
    }


def init_params(key: jax.Array,
                config: RingGNNConfig) -> Tuple[Params, State]:
    dims = (config.in_channels,) + tuple(config.hidden)
    keys = jax.random.split(key, len(config.hidden) + 1)
    params: Params = {}
    for i, (cin, cout) in enumerate(zip(dims[:-1], dims[1:])):
        params[f"l{i + 1}"] = {
            "weight": jax.random.normal(
                keys[i], (cin, cout), jnp.float32)
            * math.sqrt(2.0 / cin),
            "bias": jnp.zeros((cout,), jnp.float32),
        }
    params["fc"] = {
        "weight": jax.random.normal(
            keys[-1], (config.num_class, dims[-1]), jnp.float32)
        * math.sqrt(2.0 / dims[-1]),
        "bias": jnp.zeros((config.num_class,), jnp.float32),
    }
    return params, {}


def _clip_to_nodes(x: jax.Array) -> jax.Array:
    """(N, C, T, V, M) feeder clip -> (N*T*M, V, C) node features."""
    n, c, t, v, m = x.shape
    h = jnp.transpose(x, (0, 2, 4, 3, 1))      # (N, T, M, V, C)
    return h.reshape(n * t * m, v, c)


def _stack(params: Params, h: jax.Array, aggregate, num_layers: int,
           pool) -> jax.Array:
    """aggregate→project layers (relu between), node-mean pool, classify."""
    for i in range(num_layers):
        layer = params[f"l{i + 1}"]
        h = aggregate(h) @ layer["weight"] + layer["bias"]
        if i + 1 < num_layers:
            h = jax.nn.relu(h)
    pooled = pool(h)                            # (B, H)
    return pooled @ params["fc"]["weight"].T + params["fc"]["bias"]


def apply(
    params: Params,
    state: State,
    x: jax.Array,
    config: RingGNNConfig,
    *,
    training: bool = False,
    axis_name: Optional[str] = None,
    ring_steps=None,
    edge_axis: Optional[str] = None,
) -> Tuple[jax.Array, State]:
    """Forward.

    Dense path (default): full-graph COO aggregation per layer.

    Ring path (``ring_steps``/``edge_axis`` set, inside shard_map): x
    arrives as this device's NODE SHARD (N, C, T, V_local, M); every
    aggregation is `ring_aggregate` over the pre-bucketed edge steps and
    the pooled mean is psummed over the node axis, so node features are
    never materialized whole on any device.
    """
    del training  # no batch statistics in this family
    if ring_steps is not None:
        from shift_gcn_tpu.parallel.edge_partition import ring_aggregate

        h = _clip_to_nodes(x)

        def agg(hh):
            return ring_aggregate(hh, ring_steps, edge_axis)

        def pool(hh):
            return (jax.lax.psum(hh.sum(axis=1), edge_axis)
                    / config.num_nodes)

        return _stack(params, h, agg, len(config.hidden), pool), {}

    edges = {k: jnp.asarray(v)
             for k, v in synthetic_graph(config).items()}
    h = _clip_to_nodes(x)

    def agg(hh):
        return edge_aggregate(hh, edges, config.num_nodes)

    def pool(hh):
        return hh.mean(axis=1)

    return _stack(params, h, agg, len(config.hidden), pool), {}


def param_count(params: Params) -> int:
    return sum(int(np.prod(p.shape))
               for p in jax.tree_util.tree_leaves(params))


def config_from_args(model_args: Dict[str, Any]) -> RingGNNConfig:
    kwargs: Dict[str, Any] = {}
    if "hidden" in model_args:
        kwargs["hidden"] = tuple(int(h) for h in model_args["hidden"])
    return RingGNNConfig(
        num_class=model_args.get("num_class", 2),
        num_nodes=model_args.get("num_nodes", 256),
        in_channels=model_args.get("in_channels", 8),
        graph_seed=model_args.get("graph_seed", 3),
        extra_edges=model_args.get("extra_edges", 512),
        **kwargs,
    )
