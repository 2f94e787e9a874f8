"""Sequence-parallel (T-sharded) training: the full model under shard_map.

Composes data parallelism and temporal-axis sharding in one SPMD program:
the batch is sharded over `batch_axis`, the 300-frame clip axis over
`time_axis`, parameters are replicated, and the only cross-shard traffic is

- max_shift(+1)-frame halo `ppermute`s per temporal shift (parallel/halo.py),
- BN statistic `pmean`s over (batch, time),
- one `pmean` at the final pooling,
- the gradient `psum` the shard_map transpose inserts for the replicated
  parameters.

The resulting train step is verified bit-equal (to fp32 tolerance) against
the unsharded `train.state.make_train_step` on the 8-device CPU mesh
(tests/test_parallel.py) — the integration standard set by the reference's
nn.DataParallel (main.py:294-299), here for sequence parallelism the
reference cannot express.

Shape requirements (validated at trace time): T divisible by the time
shard count, every shard's running T_local divisible by each stride-2
block's stride, and T_local >= max_shift + 1 at every block.  The
reference T=300 does NOT shard cleanly under the default backbone
(2-way: 150 -> 75 local is odd at the second stride-2 block); pad clips
to T=304 (2-way) or T=320 (4-way).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from shift_gcn_tpu.models import shift_gcn
from shift_gcn_tpu.ops.lowering import resolve as _resolve_low
from shift_gcn_tpu.train.optim import sgd_update
from shift_gcn_tpu.train.state import TrainState, cross_entropy


def validate_time_sharding(config, t: int, n_shards: int) -> None:
    """Reject shapes where local stride-2 downsampling would diverge from
    the unsharded model (floor drops / phase-shifted sampling): T must
    split evenly, every shard's running T_local must stay divisible by
    each block's stride, and each block needs max_shift+1 frames per
    shard for the single-hop halo.  The tap radius comes from the model
    config's lowering (env > config > default), so the check matches the
    radius the halo ops actually compile with."""
    max_shift = _resolve_low(getattr(config, "lowering", None)).max_shift
    if t % n_shards != 0:
        raise ValueError(
            f"shard_time: T={t} is not divisible by {n_shards} time shards")
    t_local = t // n_shards
    for i, spec in enumerate(config.blocks):
        if t_local < max_shift + 1:
            raise ValueError(
                f"shard_time: block l{i + 1} sees T_local={t_local} < "
                f"max_shift+1={max_shift + 1}; use fewer shards, a longer "
                "T, or lower lowering.max_shift")
        if t_local % spec.stride != 0:
            raise ValueError(
                f"shard_time: block l{i + 1} (stride {spec.stride}) sees "
                f"T_local={t_local}, which is not divisible — the local "
                "downsample would drop frames and diverge from the "
                "unsharded model; pad T so T/shards stays divisible by "
                "every stride product")
        t_local //= spec.stride


def make_time_sharded_train_step(
    config,
    wd_tree: Any,
    mesh: Mesh,
    *,
    batch_axis: str = "data",
    time_axis: str = "model",
    apply_fn=None,
):
    """Train step with batch sharded over `batch_axis` and T over
    `time_axis`.  Same signature/semantics as
    `train.state.make_train_step`: (state, batch, lr) -> (state, metrics).
    """
    model_apply = apply_fn or shift_gcn.apply
    bn_axes = (batch_axis, time_axis)
    data_spec = P(batch_axis, None, time_axis)  # (N, C, T, V, M)

    def sharded_apply(params, bn_state, data):
        validate_time_sharding(config, data.shape[2],
                               mesh.shape[time_axis])

        def inner(p, s, d):
            return model_apply(p, s, d, config, training=True,
                               axis_name=bn_axes, time_axis=time_axis)

        return jax.shard_map(
            inner,
            mesh=mesh,
            in_specs=(P(), P(), data_spec),
            out_specs=(P(batch_axis), P()),
        )(params, bn_state, data)

    def loss_fn(params, bn_state, data, label):
        logits, new_bn_state = sharded_apply(params, bn_state, data)
        loss = cross_entropy(logits, label)
        return loss, (loss, logits, new_bn_state)

    def train_step(state: TrainState, batch: Dict[str, jax.Array],
                   lr: jax.Array) -> Tuple[TrainState, Dict[str, jax.Array]]:
        grads, (loss, logits, new_bn_state) = jax.grad(
            loss_fn, has_aux=True)(
                state.params, state.bn_state, batch["data"], batch["label"])
        new_params, new_opt_state = sgd_update(
            state.params, grads, state.opt_state, lr, wd_tree)
        acc = jnp.mean(
            (jnp.argmax(logits, axis=-1) == batch["label"]).astype(
                jnp.float32))
        new_state = TrainState(
            params=new_params,
            bn_state=new_bn_state,
            opt_state=new_opt_state,
            global_step=state.global_step + 1,
        )
        return new_state, {"loss": loss, "acc": acc}

    return train_step


def make_time_sharded_eval_step(
    config,
    mesh: Mesh,
    *,
    batch_axis: str = "data",
    time_axis: str = "model",
    apply_fn=None,
):
    """Eval step over the (batch, time)-sharded mesh: same contract as
    `train.state.make_eval_step` ((params, bn_state, batch) ->
    (logits, loss_sum, n))."""
    model_apply = apply_fn or shift_gcn.apply
    data_spec = P(batch_axis, None, time_axis)

    def eval_step(params, bn_state, batch):
        validate_time_sharding(config, batch["data"].shape[2],
                               mesh.shape[time_axis])

        def inner(p, s, d):
            logits, _ = model_apply(p, s, d, config, training=False,
                                    time_axis=time_axis)
            return logits

        logits = jax.shard_map(
            inner,
            mesh=mesh,
            in_specs=(P(), P(), data_spec),
            out_specs=P(batch_axis),
        )(params, bn_state, batch["data"])
        mask = batch.get("mask")
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(
            logp, batch["label"][:, None].astype(jnp.int32), axis=-1)[:, 0]
        if mask is None:
            mask = jnp.ones_like(nll)
        return logits, jnp.sum(nll * mask), jnp.sum(mask)

    return eval_step
