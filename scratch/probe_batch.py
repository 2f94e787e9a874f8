"""Probe: batch-size sweep at the shipped bf16 defaults (NO remat).

The earlier "batch 256 + remat" probe was neutral, but remat adds ~30%
recompute — masking any overhead-amortization win.  bf16 activations
halve the footprint, so batch 128 should fit WITHOUT remat; with ~300
sub-ms fusions per step (profile_r2), doubling work per op could lift
clips/s if any ops are overhead-limited rather than purely
bandwidth-limited.  Also sweeps eval batch.

Run detached: nohup python scratch/probe_batch.py > scratch/batch_r2.log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def bench_train(config, batch, steps=15, t=300):
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


def bench_eval(config, batch, steps=15, t=300):
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
    import dataclasses

    from shift_gcn_tpu.models.shift_gcn import ModelConfig

    print("devices:", jax.devices(), flush=True)
    config = ModelConfig(
        num_class=2, num_point=33, num_person=1, graph="mediapipe_pose",
        activation_dtype="bfloat16")
    for b in (64, 128, 192):
        try:
            tr = bench_train(config, b)
            print(f"train batch {b}: {tr:.1f} clips/s", flush=True)
        except Exception as e:
            print(f"train batch {b}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
    for b in (64, 128, 256):
        try:
            ev = bench_eval(config, b)
            print(f"eval batch {b}: {ev:.1f} clips/s", flush=True)
        except Exception as e:
            print(f"eval batch {b}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
    # batch 128 WITH remat for reference (memory headroom vs recompute)
    remat = dataclasses.replace(config, remat=True)
    try:
        tr = bench_train(remat, 128)
        print(f"train batch 128 + remat: {tr:.1f} clips/s", flush=True)
    except Exception as e:
        print(f"train batch 128 + remat: FAILED {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
