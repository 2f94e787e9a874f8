"""Edge-partitioned sparse graph aggregation across a mesh axis.

The north-star scaling mechanism (BASELINE.json): batch many clips' skeleton
graphs into one block-diagonal sparse problem, partition the *edges* across
devices, exchange boundary node features over ICI, and overlap the exchange
with local aggregation.

With V = 25/33 the per-graph work is tiny, so the batched layout is
(B, V, C) node features with an edge list shared across the batch; each
device owns a contiguous slice of the edge list (static shapes).  Two
exchange strategies:

- `gather`: node features replicated along the axis, aggregate owned
  edges locally, psum partial destination sums.  Optimal when V*C per
  graph is small (our regime — the psum is latency-bound and overlaps
  with the local segment-sum).
- `ring`: node features SHARDED along the axis; each device owns the
  edges whose destinations live in its node shard, bucketed by source
  shard.  P-1 `ppermute` steps rotate the node blocks around the ring
  while each device aggregates the bucket whose sources just arrived —
  boundary-feature exchange overlapped with local aggregation, O(V/P)
  memory per device, no final psum.  The strategy for graphs too large
  to replicate (big block-diagonal batched problems).

All functions run inside `jax.shard_map` over `axis_name` with edges
pre-partitioned by `partition_edges`.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def partition_edges(edges: Dict[str, np.ndarray],
                    num_partitions: int) -> Dict[str, np.ndarray]:
    """Pad the COO edge list to a multiple of num_partitions and reshape to
    (P, E_local) arrays. Padded edges carry weight 0 and point at node 0."""
    e = len(edges["src"])
    e_pad = -(-e // num_partitions) * num_partitions
    out = {}
    for key in ("src", "dst"):
        arr = np.zeros(e_pad, dtype=np.int32)
        arr[:e] = edges[key]
        out[key] = arr.reshape(num_partitions, -1)
    w = np.zeros(e_pad, dtype=np.float32)
    w[:e] = edges["weight"]
    out["weight"] = w.reshape(num_partitions, -1)
    return out


def edge_partitioned_aggregate(
    x: jax.Array,
    src: jax.Array,
    dst: jax.Array,
    weight: jax.Array,
    num_nodes: int,
    axis_name: str,
) -> jax.Array:
    """Aggregate over this shard's edges; reduce partial sums across shards.

    Inside shard_map: x is the full (B, V, C) node-feature block (replicated
    or batch-sharded along a different axis); src/dst/weight are this
    shard's (E_local,) edge slice.  Returns the full (B, V, C) aggregate
    (psum over the edge axis).
    """
    gathered = jnp.take(x, src, axis=-2) * weight[:, None]   # (B, E_loc, C)
    moved = jnp.moveaxis(gathered, -2, 0)                    # (E_loc, B, C)
    partial = jax.ops.segment_sum(moved, dst, num_segments=num_nodes)
    partial = jnp.moveaxis(partial, 0, -2)                   # (B, V, C)
    return jax.lax.psum(partial, axis_name)


def partition_edges_ring(
    edges: Dict[str, np.ndarray],
    num_partitions: int,
    num_nodes: int,
) -> Tuple[Dict[str, np.ndarray], int, int]:
    """Bucket a COO edge list for the ring strategy.

    Nodes are padded to V_pad = ceil(V / P) * P and split into P
    contiguous shards of V_loc = V_pad / P.  Device p owns every edge
    whose DST falls in its shard; its edges are bucketed by the source's
    shard, arranged so bucket r holds the edges whose sources live on
    shard (p + r) mod P — exactly the block that arrives on ring step r.

    Buckets are padded PER ARRIVAL STEP (the ring loop is unrolled with
    static r, so each step can have its own width): returns a length-P
    list of {src_local, dst_local, weight} arrays of shape (P, E_max_r),
    plus (v_pad, v_loc).  For shard-aligned block-diagonal graphs every
    edge lands in step 0, so steps r > 0 shrink to one padded slot
    instead of inflating all steps to the global maximum.  Padded slots
    carry weight 0 and index 0.
    """
    p = num_partitions
    v_loc = -(-num_nodes // p)
    v_pad = v_loc * p
    src = np.asarray(edges["src"], np.int64)
    dst = np.asarray(edges["dst"], np.int64)
    w = np.asarray(edges["weight"], np.float32)
    owner = dst // v_loc
    src_shard = src // v_loc
    buckets = [[[] for _ in range(p)] for _ in range(p)]
    for e in range(len(src)):
        o = int(owner[e])
        r = int((src_shard[e] - o) % p)
        buckets[o][r].append(e)
    steps = []
    for r in range(p):
        e_max = max((len(buckets[o][r]) for o in range(p)), default=1) or 1
        step = {
            "src_local": np.zeros((p, e_max), np.int32),
            "dst_local": np.zeros((p, e_max), np.int32),
            "weight": np.zeros((p, e_max), np.float32),
        }
        for o in range(p):
            idx = np.asarray(buckets[o][r], np.int64)
            n = len(idx)
            if not n:
                continue
            step["src_local"][o, :n] = src[idx] % v_loc
            step["dst_local"][o, :n] = dst[idx] % v_loc
            step["weight"][o, :n] = w[idx]
        steps.append(step)
    return steps, v_pad, v_loc


def ring_aggregate(
    x_shard: jax.Array,
    steps,
    axis_name: str,
) -> jax.Array:
    """Ring-exchange edge aggregation (inside shard_map).

    x_shard: this device's (B, V_loc, C) node block; ``steps``: this
    device's per-arrival-step edge buckets — a length-P sequence of
    {src_local, dst_local, weight} arrays of shape (E_max_r,), from
    `partition_edges_ring`.  On step r the buffer holds shard
    (idx + r) mod P's features; the device aggregates bucket r into its
    local accumulator while `ppermute` forwards the buffer to the left
    neighbor — XLA overlaps the collective with the segment-sum.
    Returns the (B, V_loc, C) aggregate for the local destinations
    (already complete — no psum needed).
    """
    p = jax.lax.axis_size(axis_name)
    v_loc = x_shard.shape[-2]
    buf = x_shard
    acc = jnp.zeros_like(x_shard)
    for r in range(p):
        bucket = steps[r]
        gathered = jnp.take(buf, bucket["src_local"], axis=-2)
        gathered = gathered * bucket["weight"][:, None]   # (B, E_r, C)
        moved = jnp.moveaxis(gathered, -2, 0)             # (E_r, B, C)
        partial = jax.ops.segment_sum(moved, bucket["dst_local"],
                                      num_segments=v_loc)
        acc = acc + jnp.moveaxis(partial, 0, -2)
        if r + 1 < p:
            # forward the block: device i receives shard (i + r + 1)
            buf = jax.lax.ppermute(
                buf, axis_name,
                [((i + 1) % p, i) for i in range(p)])
    return acc


def subset_coo_from_adjacency(adjacency: np.ndarray) -> Dict[str, np.ndarray]:
    """Flatten a (K, V, V) multi-subset adjacency stack into one COO edge
    list whose sources index the (K*V,)-flattened per-subset projections:
    edge (k, v, u) becomes src = k*V + u, dst = v, weight = A[k, v, u].

    This is how the ST-GCN family's sum_k A_k (X W_k) becomes a single
    partitioned segment-sum (models/stgcn._block edge path).
    """
    k, v, _ = adjacency.shape
    ks, vs, us = np.nonzero(adjacency)
    return {
        "src": (ks * v + us).astype(np.int32),
        "dst": vs.astype(np.int32),
        "weight": adjacency[ks, vs, us].astype(np.float32),
    }


def make_edge_sharded_apply(
    config,
    mesh,
    *,
    batch_axis: str = "data",
    edge_axis: str = "model",
    apply_fn=None,
):
    """Shared builder: a shard_map'd model apply with the fixed-topology
    aggregation edge-partitioned over ``edge_axis`` (gather strategy —
    node features replicated along the edge axis, partial destination
    sums psummed over ICI).  Used by both the train and eval step
    builders below."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from shift_gcn_tpu.graphs import get_graph
    from shift_gcn_tpu.models import stgcn

    model_apply = apply_fn or stgcn.apply
    graph = get_graph(config.graph)
    coo = subset_coo_from_adjacency(np.asarray(graph.A))
    parts = partition_edges(coo, mesh.shape[edge_axis])
    edge_sharding = NamedSharding(mesh, P(edge_axis))
    edges_dev = {k: jax.device_put(v, edge_sharding)
                 for k, v in parts.items()}
    data_spec = P(batch_axis)

    def sharded_apply(params, bn_state, data, training):
        def inner(p, s, d, e):
            local = {k: v[0] for k, v in e.items()}
            return model_apply(
                p, s, d, config, training=training,
                axis_name=(batch_axis,) if training else None,
                edges=local, edge_axis=edge_axis)

        return jax.shard_map(
            inner,
            mesh=mesh,
            in_specs=(P(), P(), data_spec,
                      {k: P(edge_axis) for k in edges_dev}),
            out_specs=(data_spec, P()),
        )(params, bn_state, data, edges_dev)

    return sharded_apply


def make_ring_sharded_apply(
    config,
    mesh,
    *,
    batch_axis: str = "data",
    edge_axis: str = "model",
    apply_fn=None,
):
    """Shared builder: a shard_map'd model apply with NODE features (and
    the pre-bucketed edge steps) sharded over ``edge_axis`` — the `ring`
    strategy as a launchable trainer mode, for model families whose
    apply takes ``ring_steps`` (the ring_gnn family: large synthetic
    graphs where replicating node features is the thing being avoided).
    Feeder clips (N, C, T, V, M) shard their V axis; logits come back
    batch-sharded and edge-axis-replicated (the pooled mean psums over
    the ring axis inside the model)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from shift_gcn_tpu.models import ring_gnn

    model_apply = apply_fn or ring_gnn.apply
    p_shards = mesh.shape[edge_axis]
    edges = ring_gnn.synthetic_graph(config)
    steps, v_pad, _v_loc = partition_edges_ring(
        edges, p_shards, config.num_nodes)
    if v_pad != config.num_nodes:
        raise ValueError(
            f"num_nodes={config.num_nodes} must divide evenly over the "
            f"{p_shards}-way edge axis (next multiple: {v_pad})")
    edge_sharding = NamedSharding(mesh, P(edge_axis))
    if jax.process_count() > 1:
        # jit cannot close over device arrays spanning non-addressable
        # devices (the node axis may cross processes): keep the bucket
        # tables as host constants — they are tiny and get baked into
        # the compiled program once, already edge-sharded by in_specs
        steps_dev = steps
    else:
        steps_dev = jax.tree_util.tree_map(
            lambda a: jax.device_put(a, edge_sharding), steps)
    step_specs = jax.tree_util.tree_map(lambda _: P(edge_axis), steps)
    data_spec = P(batch_axis, None, None, edge_axis, None)

    def sharded_apply(params, bn_state, data, training):
        def inner(p, s, d, st):
            local = jax.tree_util.tree_map(lambda a: a[0], st)
            return model_apply(
                p, s, d, config, training=training,
                ring_steps=local, edge_axis=edge_axis)

        return jax.shard_map(
            inner,
            mesh=mesh,
            in_specs=(P(), P(), data_spec, step_specs),
            out_specs=(P(batch_axis), P()),
        )(params, bn_state, data, steps_dev)

    return sharded_apply


def make_edge_sharded_train_step(
    config,
    wd_tree,
    mesh,
    *,
    batch_axis: str = "data",
    edge_axis: str = "model",
    apply_fn=None,
    sharded_apply=None,
):
    """ST-GCN-family train step with the graph aggregation edge-partitioned
    over ``edge_axis`` and the batch sharded over ``batch_axis``.

    Each device owns a contiguous slice of the subset-flattened COO edge
    list; the per-block aggregation all_gathers nothing (node features are
    replicated along the edge axis), segment-sums its own edges, and psums
    partial destination sums over ICI — the north-star mechanism of
    BASELINE.json, integrated into a real training step.  Verified equal
    to the unsharded dense step (tests/test_parallel.py), and launchable
    from a config (`edge_partition: true` — Trainer._build_steps), the
    same bar as the reference's config-driven `device: [0,1,2,3]`
    parallelism (main.py:294-299).

    This trains with the `gather` strategy: skeleton graphs are tiny
    (V = 25/33), so replicating node features along the edge axis is
    free and the psum is the only traffic.  The `ring` strategy
    (node-sharded, ppermute-pipelined — see `ring_aggregate`) is the
    aggregation-layer escape hatch for graphs too large to replicate;
    plugging it into a train step requires node-sharding the whole
    model's activations, which these models never need (a synthetic
    node-sharded end-to-end training demo lives in tests/test_parallel.py).

    Same contract as train.state.make_train_step.
    """
    import jax.numpy as _jnp

    from shift_gcn_tpu.train.optim import sgd_update
    from shift_gcn_tpu.train.state import TrainState, cross_entropy

    if sharded_apply is None:
        sharded_apply = make_edge_sharded_apply(
            config, mesh, batch_axis=batch_axis, edge_axis=edge_axis,
            apply_fn=apply_fn)

    def loss_fn(params, bn_state, data, label):
        logits, new_bn_state = sharded_apply(params, bn_state, data, True)
        loss = cross_entropy(logits, label)
        return loss, (loss, logits, new_bn_state)

    def train_step(state, batch, lr):
        grads, (loss, logits, new_bn_state) = jax.grad(
            loss_fn, has_aux=True)(
                state.params, state.bn_state, batch["data"], batch["label"])
        new_params, new_opt_state = sgd_update(
            state.params, grads, state.opt_state, lr, wd_tree)
        acc = _jnp.mean(
            (_jnp.argmax(logits, axis=-1) == batch["label"]).astype(
                _jnp.float32))
        return TrainState(
            params=new_params,
            bn_state=new_bn_state,
            opt_state=new_opt_state,
            global_step=state.global_step + 1,
        ), {"loss": loss, "acc": acc}

    return train_step


def make_edge_sharded_eval_step(
    config,
    mesh,
    *,
    batch_axis: str = "data",
    edge_axis: str = "model",
    apply_fn=None,
    sharded_apply=None,
):
    """Eval-step sibling of `make_edge_sharded_train_step` (running BN
    stats, padded samples masked out of the loss).  Same contract as
    train.state.make_eval_step: (params, bn_state, batch) ->
    (logits, loss_sum, n).  Pass ``sharded_apply`` (from
    `make_edge_sharded_apply`) to share one partitioned edge list with
    the train step instead of device-putting a second copy."""
    import jax.numpy as _jnp

    if sharded_apply is None:
        sharded_apply = make_edge_sharded_apply(
            config, mesh, batch_axis=batch_axis, edge_axis=edge_axis,
            apply_fn=apply_fn)

    def eval_step(params, bn_state, batch):
        logits, _ = sharded_apply(params, bn_state, batch["data"], False)
        mask = batch.get("mask")
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -_jnp.take_along_axis(
            logp, batch["label"][:, None].astype(_jnp.int32), axis=-1)[:, 0]
        if mask is None:
            mask = _jnp.ones_like(nll)
        return logits, _jnp.sum(nll * mask), _jnp.sum(mask)

    return eval_step


def make_sharded_aggregator(
    edges: Dict[str, np.ndarray],
    num_nodes: int,
    mesh,
    axis_name: str = "model",
    strategy: str = "gather",
):
    """Build a jitted (B, V, C) -> (B, V, C) aggregator with the edge list
    partitioned over `axis_name` of `mesh`.

    strategy="gather": node features replicated, partial sums psummed.
    strategy="ring": node features sharded over the axis too; P-1
    ppermute steps exchange boundary blocks, overlapped with the local
    segment-sums (see module docstring).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    if strategy == "ring":
        n_part = mesh.shape[axis_name]
        steps, v_pad, v_loc = partition_edges_ring(
            edges, n_part, num_nodes)
        edge_sharding = NamedSharding(mesh, P(axis_name))
        dev_steps = jax.tree_util.tree_map(
            lambda a: jax.device_put(a, edge_sharding), steps)
        x_spec = P(None, axis_name, None)
        step_specs = jax.tree_util.tree_map(
            lambda _: P(axis_name), steps)

        @jax.jit
        def aggregate_ring(x):
            b, v, c = x.shape
            xp = jnp.pad(x, ((0, 0), (0, v_pad - v), (0, 0)))

            def inner(xb, s):
                local = jax.tree_util.tree_map(lambda a: a[0], s)
                return ring_aggregate(xb, local, axis_name)

            out = jax.shard_map(
                inner,
                mesh=mesh,
                in_specs=(x_spec, step_specs),
                out_specs=x_spec,
            )(xp, dev_steps)
            return out[:, :num_nodes]

        return aggregate_ring
    if strategy != "gather":
        raise ValueError(f"unknown strategy {strategy!r}")

    parts = partition_edges(edges, mesh.shape[axis_name])
    edge_sharding = NamedSharding(mesh, P(axis_name))
    src = jax.device_put(parts["src"], edge_sharding)
    dst = jax.device_put(parts["dst"], edge_sharding)
    weight = jax.device_put(parts["weight"], edge_sharding)

    @jax.jit
    def aggregate(x):
        def inner(x_blk, src_blk, dst_blk, w_blk):
            return edge_partitioned_aggregate(
                x_blk, src_blk[0], dst_blk[0], w_blk[0], num_nodes,
                axis_name)

        return jax.shard_map(
            inner,
            mesh=mesh,
            in_specs=(P(), P(axis_name), P(axis_name), P(axis_name)),
            out_specs=P(),
        )(x, src, dst, weight)

    return aggregate
