"""Aggregation-based spatial-temporal GCN (ST-GCN-style) on the same
framework primitives.

The Shift-GCN family replaces adjacency aggregation with channel shifts;
this sibling model family keeps the classic multi-subset adjacency
aggregation (out = sum_k A_k X W_k — reference lineage: ST-GCN/2s-AGCN,
the architecture Shift-GCN's repo descends from) so the framework
demonstrably supports general message passing: dense per-subset MXU
matmuls on small graphs, or the edge-partitioned sparse path on meshes
(parallel/edge_partition.py).

Same external contract as models.shift_gcn: torch-style param pytrees,
(N, C, T, V, M) input, functional apply returning (logits, new_state).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from shift_gcn_tpu.graphs import get_graph
from shift_gcn_tpu.ops.aggregate import dense_graph_aggregate
from shift_gcn_tpu.ops.batchnorm import batch_norm, init_bn
from shift_gcn_tpu.ops.conv import pointwise_conv, temporal_conv

Params = Dict[str, Any]
State = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class STGCNConfig:
    num_class: int = 60
    num_point: int = 25
    num_person: int = 2
    graph: str = "ntu_rgb_d"
    in_channels: int = 3
    channels: Tuple[int, ...] = (64, 64, 64, 128, 128, 256, 256)
    strides: Tuple[int, ...] = (1, 1, 1, 2, 1, 2, 1)
    temporal_kernel: int = 9
    adaptive: bool = True   # learnable residual adjacency (AGCN-style B)
    # data-dependent adjacency (2s-AGCN-style C): per-subset theta/phi
    # embeddings of this width produce per-sample (V, V) attention via a
    # dense SDDMM + softmax (ops/aggregate.sddmm_dense lineage); 0 = off.
    # The reference Shift-GCN repo descends from 2s-AGCN and carries its
    # unused A buffers (model/shift_gcn.py:78) — this closes that loop.
    adaptive_embed: int = 0


def init_params(key: jax.Array, config: STGCNConfig) -> Tuple[Params, State]:
    graph = get_graph(config.graph)
    a = jnp.asarray(graph.A)  # (K, V, V)
    k_sub = a.shape[0]
    v = config.num_point

    keys = jax.random.split(key, len(config.channels) * 3 + 2)
    data_bn_p, data_bn_s = init_bn(
        config.num_person * config.in_channels * v)
    params: Params = {"data_bn": data_bn_p}
    state: State = {"data_bn": data_bn_s}

    cin = config.in_channels
    for i, (cout, _) in enumerate(zip(config.channels, config.strides)):
        kw, kt, kr = jax.random.split(keys[i], 3)
        block: Params = {
            # per-subset projection (K, C_in, C_out)
            "gcn_weight": jax.random.normal(
                kw, (k_sub, cin, cout), dtype=jnp.float32)
            * math.sqrt(2.0 / (k_sub * cout)),
            "gcn_bias": jnp.zeros((cout,), jnp.float32),
            "tcn": {
                "weight": jax.random.normal(
                    kt, (cout, cout, config.temporal_kernel, 1),
                    dtype=jnp.float32)
                * math.sqrt(2.0 / (cout * config.temporal_kernel)),
                "bias": jnp.zeros((cout,), jnp.float32),
            },
        }
        if config.adaptive:
            block["B"] = jnp.zeros((k_sub, v, v), jnp.float32)
        if config.adaptive_embed:
            d_e = config.adaptive_embed
            kt_, kp_ = jax.random.split(kr, 2)
            # small init: the data-dependent term starts as a gentle
            # perturbation of A (+ B), like 2s-AGCN's 1x1-conv embeddings
            block["theta"] = jax.random.normal(
                kt_, (k_sub, cin, d_e), jnp.float32) * math.sqrt(1.0 / cin)
            block["phi"] = jax.random.normal(
                kp_, (k_sub, cin, d_e), jnp.float32) * math.sqrt(1.0 / cin)
        bn1_p, bn1_s = init_bn(cout)
        bn2_p, bn2_s = init_bn(cout)
        block["bn1"] = bn1_p
        block["bn2"] = bn2_p
        block_s: State = {"bn1": bn1_s, "bn2": bn2_s}
        if cin != cout:
            block["down"] = {
                "weight": jax.random.normal(
                    kr, (cout, cin, 1, 1), dtype=jnp.float32)
                * math.sqrt(2.0 / cout),
                "bias": jnp.zeros((cout,), jnp.float32),
            }
            down_bn_p, down_bn_s = init_bn(cout)
            block["down_bn"] = down_bn_p
            block_s["down_bn"] = down_bn_s
        params[f"l{i + 1}"] = block
        state[f"l{i + 1}"] = block_s
        cin = cout

    fc_key = keys[-1]
    params["fc"] = {
        "weight": jax.random.normal(
            fc_key, (config.num_class, cin), dtype=jnp.float32)
        * math.sqrt(2.0 / config.num_class),
        "bias": jnp.zeros((config.num_class,), jnp.float32),
    }
    return params, state


def adaptive_attention(x: jax.Array, theta: jax.Array,
                       phi: jax.Array) -> jax.Array:
    """Per-sample data-dependent adjacency (2s-AGCN's C matrix).

    x: (N, T, V, C); theta/phi: (K, C, d).  Embeds every (t, v) node,
    contracts over (T, d) into per-sample (V, V) scores — a dense SDDMM
    over the complete graph (V <= 33, so the full product is one small
    MXU matmul) — and row-softmaxes into attention weights.

    Temperature: scores are normalized by 1/T only, a deliberate delta
    from 2s-AGCN's 1/(C_e*T) softmax argument.  The embeddings here are
    init-scaled by 1/sqrt(C) (init_params), so score magnitude is already
    d-independent at init; dividing by d as well would flatten the
    softmax toward uniform as the embed width grows.  Opt-in feature
    (adaptive_embed=0 default) — oracle-tested against numpy at this
    normalization (tests/test_stgcn.py).

    Returns (K, N, V, V).
    """
    a = jnp.einsum("ntvc,kcd->knvtd", x, theta,
                   preferred_element_type=jnp.float32)
    b = jnp.einsum("ntuc,kcd->knutd", x, phi,
                   preferred_element_type=jnp.float32)
    t = x.shape[1]
    scores = jnp.einsum("knvtd,knutd->knvu", a, b,
                        preferred_element_type=jnp.float32) / t
    return jax.nn.softmax(scores, axis=-1)


def _block(params, state, x, stride, adj_base, *, training, axis_name,
           edges=None, edge_axis=None):
    """x: (N, T, V, C_in) -> (N, T//stride, V, C_out).

    With ``edges``/``edge_axis`` set (inside shard_map, this device's
    slice of the subset-flattened COO edge list), the fixed-topology
    aggregation runs edge-partitioned across the mesh axis
    (parallel/edge_partition.py); the learnable residual adjacency B stays
    a dense (tiny) matmul, so the result is exactly dense(A + B).
    """
    if edges is not None:
        from shift_gcn_tpu.parallel.edge_partition import (
            edge_partitioned_aggregate)

        v = x.shape[-2]
        # per-subset projection, then flatten (K, V) into one node axis so
        # a single partitioned segment-sum covers all subsets
        hk = jnp.einsum("...uc,kcd->k...ud", x, params["gcn_weight"],
                        preferred_element_type=jnp.float32)
        hk = jnp.moveaxis(hk, 0, -3)                     # (..., K, V, D)
        hk = hk.reshape(hk.shape[:-3] + (-1, hk.shape[-1]))  # (..., K*V, D)
        h = edge_partitioned_aggregate(
            hk, edges["src"], edges["dst"], edges["weight"], v, edge_axis)
        if "B" in params:
            h = h + dense_graph_aggregate(
                x, params["B"], params["gcn_weight"])
    else:
        # fixed topology + learnable residual adjacency (AGCN-style)
        adj = adj_base if "B" not in params else adj_base + params["B"]
        h = dense_graph_aggregate(x, adj, params["gcn_weight"])
    if "theta" in params:
        # data-dependent attention term (dense, per-sample): computed
        # densely in BOTH the dense and edge-partitioned paths, so
        # edge-partitioned training stays exactly equal to dense
        attn = adaptive_attention(x, params["theta"], params["phi"])
        hk2 = jnp.einsum("...uc,kcd->k...ud", x, params["gcn_weight"],
                         preferred_element_type=jnp.float32)
        h = h + jnp.einsum("knvu,kntud->ntvd", attn, hk2,
                           preferred_element_type=jnp.float32)
    h = h + params["gcn_bias"]
    h, bn1_state = batch_norm(
        h, params["bn1"], state["bn1"], reduce_axes=(0, 1, 2),
        training=training, axis_name=axis_name)
    h = jax.nn.relu(h)
    h = temporal_conv(h, params["tcn"]["weight"], params["tcn"]["bias"],
                      stride=stride)
    h, bn2_state = batch_norm(
        h, params["bn2"], state["bn2"], reduce_axes=(0, 1, 2),
        training=training, axis_name=axis_name)
    new_state: State = {"bn1": bn1_state, "bn2": bn2_state}
    if "down" in params:
        res = pointwise_conv(x, params["down"]["weight"],
                             params["down"]["bias"])
        if stride != 1:
            res = res[:, ::stride]
        res, down_state = batch_norm(
            res, params["down_bn"], state["down_bn"], reduce_axes=(0, 1, 2),
            training=training, axis_name=axis_name)
        new_state["down_bn"] = down_state
    else:
        res = x if stride == 1 else x[:, ::stride]
    return jax.nn.relu(h + res), new_state


def apply(
    params: Params,
    state: State,
    x: jax.Array,
    config: STGCNConfig,
    *,
    training: bool = False,
    axis_name: Optional[str] = None,
    edges: Optional[Dict[str, jax.Array]] = None,
    edge_axis: Optional[str] = None,
) -> Tuple[jax.Array, State]:
    """Forward.  ``edges``/``edge_axis``: run the fixed-topology
    aggregation edge-partitioned over a mesh axis (this device's COO
    slice, inside shard_map — see parallel.edge_partition)."""
    n, c, t, v, m = x.shape
    h = jnp.transpose(x, (0, 4, 3, 1, 2)).reshape(n, m * v * c, t)
    h = jnp.transpose(h, (0, 2, 1))
    h, data_bn_state = batch_norm(
        h, params["data_bn"], state["data_bn"], reduce_axes=(0, 1),
        training=training, axis_name=axis_name)
    h = h.reshape(n, t, m, v, c)
    h = jnp.transpose(h, (0, 2, 1, 3, 4)).reshape(n * m, t, v, c)

    new_state: State = {"data_bn": data_bn_state}
    adj_base = jnp.asarray(get_graph(config.graph).A)
    for i, stride in enumerate(config.strides):
        name = f"l{i + 1}"
        h, block_state = _block(
            params[name], state[name], h, stride, adj_base,
            training=training, axis_name=axis_name, edges=edges,
            edge_axis=edge_axis)
        new_state[name] = block_state

    feat = h.shape[-1]
    h = h.reshape(n, m, -1, feat).mean(axis=2).mean(axis=1)
    logits = h @ params["fc"]["weight"].T + params["fc"]["bias"]
    return logits, new_state


def param_count(params: Params) -> int:
    return sum(int(np.prod(p.shape))
               for p in jax.tree_util.tree_leaves(params))
