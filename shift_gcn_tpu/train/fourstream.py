"""Concurrent four-stream training — all modality streams in one jit.

The reference trains joint / bone / joint_motion / bone_motion sequentially
as four separate runs over pre-derived datasets (README run matrix;
data_gen/gen_bone_data*.py, gen_motion_data*.py), then fuses scores
(ensemble_mediapipe.py).  TPU-native formulation:

- modalities are *derived on device* from the joint stream inside the jitted
  step (bone = joint - parent gather; motion = frame diff) — one host
  pipeline and one HBM copy of the data instead of four datasets on disk,
- the four models train as one vmapped step over stacked parameter pytrees:
  a single XLA program with 4x-batched kernels instead of four sequential
  runs (vmap composes with the data-parallel mesh sharding),
- eval produces all four per-stream score sets plus the weighted ensemble
  fusion (alpha = 0.6/0.6/0.4/0.4, reference ensemble_mediapipe.py:20-27)
  in the same pass.

Numerical parity: each stream's step is bit-identical to training that
stream alone with the same init key (verified in tests/test_fourstream.py);
the derivation matches the offline generators (data/modalities.py oracle).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from shift_gcn_tpu.graphs import SkeletonGraph, get_graph
from shift_gcn_tpu.train.state import (
    TrainState, create_train_state, make_eval_step, make_train_step)

STREAMS = ("joint", "bone", "joint_motion", "bone_motion")
# reference ensemble weights (ensemble_mediapipe.py:20-27)
ENSEMBLE_ALPHAS = (0.6, 0.6, 0.4, 0.4)


def derive_modalities_device(joint: jax.Array,
                             parents: np.ndarray) -> jax.Array:
    """(N, C, T, V, M) joint batch -> (4, N, C, T, V, M) stacked streams.

    Same math as the offline generators (data/modalities.py): bone is a
    parent-difference over the static spanning tree (roots self-reference,
    so their bone is zero); motion is the forward frame difference with the
    last frame zeroed (reference: gen_bone_data_mediapipe.py:47-67,
    gen_motion_data.py:16-31).
    """
    bone = joint - joint[..., parents, :]

    def motion(x: jax.Array) -> jax.Array:
        d = x[:, :, 1:] - x[:, :, :-1]
        return jnp.concatenate(
            [d, jnp.zeros_like(x[:, :, :1])], axis=2)

    return jnp.stack([joint, bone, motion(joint), motion(bone)])


def create_fourstream_state(key: jax.Array, config,
                            init_fn=None) -> TrainState:
    """Four independently-initialized models stacked leaf-wise (axis 0)."""
    keys = jax.random.split(key, len(STREAMS))
    states = [create_train_state(k, config, init_fn=init_fn) for k in keys]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)


def unstack_stream(state4: TrainState, i: int) -> TrainState:
    """Extract stream i as a standalone TrainState (checkpoint export)."""
    return jax.tree_util.tree_map(lambda x: x[i], state4)


def stack_streams(states) -> TrainState:
    """Inverse of `unstack_stream` over a length-4 list (resume import)."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)


def make_fourstream_train_step(config, wd_tree: Any, graph: SkeletonGraph,
                               apply_fn=None, mode: str = "scan"):
    """(state4, batch{data,label}, lr) -> (state4, metrics per stream).

    `batch['data']` is the *joint* stream; the other three are derived on
    device.  Labels are shared across streams (same clips).

    `mode` picks how the four per-stream steps compose inside the jit
    (identical math either way; per-stream bit-parity is tested):

    - "scan" (default): `lax.map` runs the streams SEQUENTIALLY, so only
      one stream's activations are live at a time — same HBM footprint
      and per-clip speed as single-stream training.  Measured TPU v5e
      batch 64 bf16: ~400 stream-clips/s.
    - "vmap": all four streams batched into one program.  4x the
      activation memory: at the reference batch 64 the full model EXCEEDS
      one v5e chip's HBM (the AOT compile helper dies, probe26/27) —
      usable with `remat: true` (235 stream-clips/s) or batch <= 16
      (350), and on multi-chip meshes where the batch axis is sharded.
    """
    parents = graph.bone_parents()
    base_step = make_train_step(config, wd_tree, apply_fn=apply_fn)

    if mode == "vmap":
        vstep = jax.vmap(base_step,
                         in_axes=(0, {"data": 0, "label": None}, None))

        def step(state4: TrainState, batch: Dict[str, jax.Array],
                 lr: jax.Array) -> Tuple[TrainState, Dict[str, jax.Array]]:
            data4 = derive_modalities_device(batch["data"], parents)
            return vstep(state4, {"data": data4, "label": batch["label"]},
                         lr)

        return step

    def step(state4: TrainState, batch: Dict[str, jax.Array],
             lr: jax.Array) -> Tuple[TrainState, Dict[str, jax.Array]]:
        data4 = derive_modalities_device(batch["data"], parents)

        def one(args):
            state, data = args
            return base_step(state, {"data": data,
                                     "label": batch["label"]}, lr)

        return jax.lax.map(one, (state4, data4))

    return step


def make_fourstream_eval_step(config, graph: SkeletonGraph, apply_fn=None):
    """(params4, bn4, batch) -> (logits (4,N,K), ensemble (N,K), loss_sums,
    ns).  Ensemble = alpha-weighted raw-logit sum (reference
    ensemble_mediapipe.py fuses stored scores the same way)."""
    parents = graph.bone_parents()
    base_eval = make_eval_step(config, apply_fn=apply_fn)
    veval = jax.vmap(
        base_eval,
        in_axes=(0, 0, {"data": 0, "label": None, "mask": None}))
    alphas = jnp.asarray(ENSEMBLE_ALPHAS, jnp.float32)

    def step(params4, bn4, batch):
        data4 = derive_modalities_device(batch["data"], parents)
        mask = batch.get("mask")
        if mask is None:
            mask = jnp.ones(batch["label"].shape, jnp.float32)
        logits4, loss_sums, ns = veval(
            params4, bn4, {"data": data4, "label": batch["label"],
                           "mask": mask})
        ensemble = jnp.einsum("s,snk->nk", alphas, logits4)
        return logits4, ensemble, loss_sums, ns

    return step


def graph_for_config(config) -> SkeletonGraph:
    return get_graph(config.graph)
