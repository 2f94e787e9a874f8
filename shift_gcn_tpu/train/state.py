"""Train state and jit-compiled train/eval steps.

The step functions are pure and shardable: under `jax.jit` with a device
mesh, batch axes sharded over the 'data' mesh axis give data parallelism
with XLA-inserted gradient all-reduces over ICI — the TPU-native equivalent
of the reference's nn.DataParallel (main.py:294-299).  BN statistics are
computed over the *global* logical batch (sync-BN by construction under a
single jit; the reference's per-GPU BN is an artifact of DataParallel, not a
design choice).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from shift_gcn_tpu.models import shift_gcn
from shift_gcn_tpu.train.optim import SGDState, init_sgd, sgd_update


class TrainState(NamedTuple):
    params: Any
    bn_state: Any
    opt_state: SGDState
    global_step: jax.Array  # int32 scalar


def create_train_state(
    key: jax.Array, config, init_fn=None
) -> TrainState:
    init_fn = init_fn or shift_gcn.init_params
    params, bn_state = init_fn(key, config)
    return TrainState(
        params=params,
        bn_state=bn_state,
        opt_state=init_sgd(params),
        global_step=jnp.zeros((), jnp.int32),
    )


def cross_entropy(logits: jax.Array, labels: jax.Array,
                  mask: Optional[jax.Array] = None) -> jax.Array:
    """Mean softmax cross-entropy (reference: nn.CrossEntropyLoss,
    main.py:259), with optional validity mask for padded batches."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32),
                               axis=-1)[:, 0]
    if mask is None:
        return jnp.mean(nll)
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def make_train_step(config, wd_tree: Any,
                    axis_name: Optional[str] = None, apply_fn=None):
    """Build the train step fn: (state, batch, lr) -> (state, metrics).

    batch: dict with 'data' (N,C,T,V,M) float32, 'label' (N,) int32.
    `apply_fn` selects the model family (default: shift_gcn.apply).
    """
    model_apply = apply_fn or shift_gcn.apply

    def loss_fn(params, bn_state, data, label):
        logits, new_bn_state = model_apply(
            params, bn_state, data, config, training=True,
            axis_name=axis_name)
        loss = cross_entropy(logits, label)
        return loss, (loss, logits, new_bn_state)

    def train_step(state: TrainState, batch: Dict[str, jax.Array],
                   lr: jax.Array) -> Tuple[TrainState, Dict[str, jax.Array]]:
        grads, (loss, logits, new_bn_state) = jax.grad(
            loss_fn, has_aux=True)(
                state.params, state.bn_state, batch["data"], batch["label"])
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
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


def make_eval_step(config, apply_fn=None):
    """Build the eval step: (params, bn_state, batch) -> (logits, loss_sum, n).

    Uses running BN stats (training=False); padded samples are masked out of
    the loss, logits are returned for score aggregation (the reference dumps
    per-sample scores for the ensemble, main.py:493-515).
    """
    model_apply = apply_fn or shift_gcn.apply

    def eval_step(params, bn_state, batch):
        logits, _ = model_apply(
            params, bn_state, batch["data"], config, training=False)
        mask = batch.get("mask")
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(
            logp, batch["label"][:, None].astype(jnp.int32), axis=-1)[:, 0]
        if mask is None:
            mask = jnp.ones_like(nll)
        return logits, jnp.sum(nll * mask), jnp.sum(mask)

    return eval_step
