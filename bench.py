"""Benchmark: flagship-model training throughput on the attached TPU.

Prints ONE JSON line:
  {"metric": "train_clips_per_sec", "value": N, "unit": "clips/s",
   "vs_baseline": N / 47.0}

Baseline: the reference trains ~47 clips/s on one NVIDIA GPU (derived in
BASELINE.md from TRAINING_REPORT.md:278-284 — 140 epochs x 42 batches x 64
clips in ~2.2 h).  Same workload shape here: MediaPipe fall-detection config,
batch 64, clips (3, 300, 33, 1), full train step (fwd + bwd + SGD update +
BN state update) including host->device transfer of each batch.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--smoke", action="store_true",
                        help="tiny shapes / CPU-friendly quick check")
    parser.add_argument("--steps", type=int, default=20)
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument("--compute-dtype", default=None,
                        help="e.g. bfloat16 for matmul inputs")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from shift_gcn_tpu.models.shift_gcn import BlockSpec, ModelConfig
    from shift_gcn_tpu.train.optim import build_weight_decay_tree
    from shift_gcn_tpu.train.state import create_train_state, make_train_step

    if args.smoke:
        config = ModelConfig(
            num_class=2, num_point=25, num_person=1, graph="ntu_rgb_d",
            blocks=(BlockSpec(3, 8, residual=False), BlockSpec(8, 16, stride=2)),
            compute_dtype=args.compute_dtype)
        batch_size, t = 8, 32
        steps = 3
    else:
        config = ModelConfig(
            num_class=2, num_point=33, num_person=1, graph="mediapipe_pose",
            compute_dtype=args.compute_dtype)
        batch_size, t = args.batch_size, 300
        steps = args.steps

    state = create_train_state(jax.random.key(0), config)
    wd_tree = build_weight_decay_tree(state.params)
    train_step = jax.jit(make_train_step(config, wd_tree),
                         donate_argnums=(0,))

    rng = np.random.default_rng(0)
    host_batch = {
        "data": rng.standard_normal(
            (batch_size, 3, t, config.num_point, config.num_person)
        ).astype(np.float32),
        "label": rng.integers(0, config.num_class, batch_size).astype(np.int32),
    }
    lr = jnp.asarray(0.1, jnp.float32)

    # warmup / compile
    for _ in range(2):
        batch = jax.device_put(host_batch)
        state, metrics = train_step(state, batch, lr)
    jax.block_until_ready(metrics)

    t0 = time.perf_counter()
    for _ in range(steps):
        batch = jax.device_put(host_batch)
        state, metrics = train_step(state, batch, lr)
    jax.block_until_ready(metrics)
    dt = time.perf_counter() - t0

    clips_per_sec = steps * batch_size / dt
    print(json.dumps({
        "metric": "train_clips_per_sec",
        "value": round(clips_per_sec, 2),
        "unit": "clips/s",
        "vs_baseline": round(clips_per_sec / 47.0, 2),
    }))


if __name__ == "__main__":
    main()
