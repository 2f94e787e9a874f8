"""AOT model export for serving — serialized StableHLO artifacts.

The reference serves by loading torch checkpoints into Python at request
time (inference_pipeline.py:617-621).  TPU-native serving wants the
opposite: compile once, ship an artifact, run it anywhere XLA runs with no
model code on the serving host.  `jax.export` lowers the jitted eval
forward (params baked in as constants or passed as inputs) to versioned
StableHLO with compatibility guarantees.

Two artifact flavors:
- ``export_eval`` — params are *inputs*: one artifact serves any checkpoint
  of the same architecture (weights hot-swap at call time).  Measured
  FASTER: weights-as-arguments runs at full live-jit speed (1566 vs 1571
  clips/s on one v5e), while weights-as-constants executables lose ~17%
  (1344 — XLA pins large constants to default layouts; probe50,
  docs/PERF.md).
- ``export_eval_baked`` — params are *baked* into the artifact as
  constants: single self-contained file (the `serve.py` no-checkpoint
  contract), at the measured ~17% cost.

CLI: ``python -m shift_gcn_tpu.inference.export --checkpoint <dir>
--out model.shlo [--baked]``.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

from shift_gcn_tpu.models.shift_gcn import ModelConfig, apply


def _eval_fn(config: ModelConfig):
    def fn(params, bn_state, x):
        logits, _ = apply(params, bn_state, x, config, training=False)
        return logits

    return fn


def export_eval(
    params,
    bn_state,
    config: ModelConfig,
    batch_size: int,
    seq_len: int = 300,
) -> bytes:
    """Serialize the eval forward with params/bn as runtime inputs."""
    fn = jax.jit(_eval_fn(config))
    x_spec = jax.ShapeDtypeStruct(
        (batch_size, config.in_channels, seq_len, config.num_point,
         config.num_person), jnp.float32)
    spec = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), (params, bn_state))
    exp = jax_export.export(fn)(spec[0], spec[1], x_spec)
    return bytes(exp.serialize())


def export_eval_baked(
    params,
    bn_state,
    config: ModelConfig,
    batch_size: int,
    seq_len: int = 300,
) -> bytes:
    """Serialize the eval forward with the weights baked in as constants."""
    fn = _eval_fn(config)
    baked = jax.jit(lambda x: fn(params, bn_state, x))
    x_spec = jax.ShapeDtypeStruct(
        (batch_size, config.in_channels, seq_len, config.num_point,
         config.num_person), jnp.float32)
    exp = jax_export.export(baked)(x_spec)
    return bytes(exp.serialize())


def load_exported(blob: bytes):
    """Deserialize an artifact; returns an object with ``.call(...)``."""
    return jax_export.deserialize(blob)


def restore_eval_weights(checkpoint_path: str,
                         config: Optional[ModelConfig] = None):
    """(params, bn_state) from an Orbax checkpoint dir or run dir —
    shared by artifact export and inputs-flavor serving."""
    from shift_gcn_tpu.models.shift_gcn import init_params
    from shift_gcn_tpu.train.optim import init_sgd
    from shift_gcn_tpu.utils import checkpoint as ckpt_lib

    config = config or ModelConfig(
        num_class=2, num_point=33, num_person=1, graph="mediapipe_pose")
    params, bn_state = init_params(jax.random.key(0), config)
    path = checkpoint_path
    if os.path.isdir(path) and not os.path.basename(path).isdigit():
        latest = ckpt_lib.latest_checkpoint(path)
        if latest is None:
            raise FileNotFoundError(f"no checkpoints under {path}")
        path = latest
    template = {
        "params": params, "bn_state": bn_state,
        "opt_state": init_sgd(params),
        "global_step": jnp.zeros((), jnp.int32),
        "meta": {"epoch": 0, "best_acc": 0.0},
    }
    payload = ckpt_lib.restore_checkpoint(path, template)
    return payload["params"], payload["bn_state"]


def restore_weights_for_artifact(checkpoint_path: str, artifact):
    """(params, bn_state) restored with the params-as-inputs ARTIFACT's
    own input avals as the template — serves any architecture without
    knowing its config (the artifact records every weight's shape/dtype
    in in_avals/in_tree)."""
    from shift_gcn_tpu.train.optim import init_sgd
    from shift_gcn_tpu.utils import checkpoint as ckpt_lib

    leaves = [np.zeros(a.shape, a.dtype) for a in artifact.in_avals]
    call_args, _kwargs = jax.tree_util.tree_unflatten(
        artifact.in_tree, leaves)
    if len(call_args) != 3:
        raise ValueError(
            "artifact does not take (params, bn_state, x) inputs — "
            "baked artifacts need no weights")
    params_t, bn_t, _x = call_args
    path = checkpoint_path
    if os.path.isdir(path) and not os.path.basename(path).isdigit():
        latest = ckpt_lib.latest_checkpoint(path)
        if latest is None:
            raise FileNotFoundError(f"no checkpoints under {path}")
        path = latest
    template = {
        "params": params_t, "bn_state": bn_t,
        "opt_state": init_sgd(params_t),
        "global_step": jnp.zeros((), jnp.int32),
        "meta": {"epoch": 0, "best_acc": 0.0},
    }
    payload = ckpt_lib.restore_checkpoint(path, template)
    return payload["params"], payload["bn_state"]


def export_checkpoint(
    checkpoint_path: str,
    out_path: str,
    *,
    config: Optional[ModelConfig] = None,
    batch_size: int = 64,
    seq_len: int = 300,
    baked: bool = False,
) -> str:
    """Load an Orbax checkpoint (or run dir) and write a .shlo artifact.

    Default flavor is params-as-inputs — the recommended (and ~17%
    faster, probe50) one; pass ``baked=True`` for the self-contained
    single-file contract."""
    config = config or ModelConfig(
        num_class=2, num_point=33, num_person=1, graph="mediapipe_pose")
    params, bn_state = restore_eval_weights(checkpoint_path, config)
    exporter = export_eval_baked if baked else export_eval
    blob = exporter(params, bn_state, config, batch_size, seq_len)
    with open(out_path, "wb") as f:
        f.write(blob)
    return out_path


def main(argv=None):
    import argparse

    parser = argparse.ArgumentParser(
        description="export a checkpoint to a StableHLO serving artifact")
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument("--seq-len", type=int, default=300)
    parser.add_argument(
        "--baked", action="store_true", default=False,
        help="bake the weights into the artifact as constants: one "
        "self-contained file, but ~17%% slower than the default "
        "params-as-inputs flavor (XLA pins large constants to default "
        "layouts; docs/PERF.md probe50)")
    parser.add_argument("--no-baked", dest="baked", action="store_false",
                        help="(default) params-as-inputs artifact")
    parser.add_argument("--num-class", type=int, default=2)
    parser.add_argument("--num-point", type=int, default=33)
    parser.add_argument("--num-person", type=int, default=1)
    parser.add_argument("--graph", default="mediapipe_pose")
    args = parser.parse_args(argv)
    config = ModelConfig(
        num_class=args.num_class, num_point=args.num_point,
        num_person=args.num_person, graph=args.graph)
    out = export_checkpoint(
        args.checkpoint, args.out, config=config,
        batch_size=args.batch_size, seq_len=args.seq_len, baked=args.baked)
    print(f"wrote {out} ({os.path.getsize(out)} bytes)")


if __name__ == "__main__":
    main()
