"""Probe: SGT_BN_LP=1 (bf16 BN normalize pass) train/eval throughput.

BN is ~26 ms of the 156 ms train step (probe23 ablation).  With bf16
activations the normalize pass currently upcasts the big tensor to fp32
and back; SGT_BN_LP=1 keeps it in bf16 (stats stay fp32).  Measure both
settings in ONE process (env is read at trace time, so re-jit per
setting), eval and train.

Run detached AFTER other TPU work: nohup python scratch/probe_bnlp.py >
scratch/bnlp_r2.log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def bench_train(config, steps=20, batch=64, t=300):
    from shift_gcn_tpu.train.optim import build_weight_decay_tree
    from shift_gcn_tpu.train.state import create_train_state, make_train_step

    state = create_train_state(jax.random.key(0), config)
    wd = build_weight_decay_tree(state.params)
    step = jax.jit(make_train_step(config, wd), donate_argnums=(0,))
    rng = np.random.default_rng(0)
    hb = {
        "data": rng.standard_normal(
            (batch, 3, t, config.num_point, 1)).astype(np.float32),
        "label": rng.integers(0, 2, batch).astype(np.int32),
    }
    lr = jnp.asarray(0.1, jnp.float32)
    for _ in range(2):
        state, m = step(state, jax.device_put(hb), lr)
    jax.block_until_ready(m)
    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = step(state, jax.device_put(hb), lr)
    jax.block_until_ready(m)
    return steps * batch / (time.perf_counter() - t0)


def bench_eval(config, steps=20, batch=64, t=300):
    from shift_gcn_tpu.models.shift_gcn import apply, init_params

    params, st = init_params(jax.random.key(0), config)
    fwd = jax.jit(lambda p, s, x: apply(p, s, x, config, training=False)[0])
    rng = np.random.default_rng(0)
    x = jax.device_put(rng.standard_normal(
        (batch, 3, t, config.num_point, 1)).astype(np.float32))
    out = fwd(params, st, x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fwd(params, st, x)
    jax.block_until_ready(out)
    return steps * batch / (time.perf_counter() - t0)


def main():
    from shift_gcn_tpu.models.shift_gcn import ModelConfig

    print("devices:", jax.devices(), flush=True)
    config = ModelConfig(
        num_class=2, num_point=33, num_person=1, graph="mediapipe_pose",
        activation_dtype="bfloat16")
    for bnlp in ("0", "1"):
        os.environ["SGT_BN_LP"] = bnlp
        tr = bench_train(config)
        ev = bench_eval(config)
        print(f"SGT_BN_LP={bnlp}: train {tr:.1f} clips/s  "
              f"eval {ev:.1f} clips/s", flush=True)


if __name__ == "__main__":
    main()
