"""Probe 34: re-ground the driver throughput number (VERDICT r2 item 1).

ONE process, driver protocol (bench.py default args: batch 64, T=300,
bf16 activations, 20-step timed loop with prefetch-thread device_put,
donated state), >=4 interleaved reps of each config:

  A: SGT_TSHIFT_IMPL=conv   (round-1 default)
  B: SGT_TSHIFT_IMPL=dft    (round-2 default, flipped in ca1c565)
  C: SGT_SGCN_IMPL=circconv (spatial control; tshift=dft)

Env vars are read at trace time, so each config gets its own jit within
the same process / same TPU claim.  Interleaved rounds (A B C A B C ...)
separate config effect from platform drift.

Run:  cd /root/repo && nohup python scratch/tpu_probe34_ab.py \
          > scratch/queue34.log 2>&1 & echo $! > scratch/queue34.pid
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from concurrent.futures import ThreadPoolExecutor

import numpy as np

BATCH, T, STEPS, ROUNDS = 64, 300, 20, 4

CONFIGS = [
    ("conv", {"SGT_TSHIFT_IMPL": "conv"}),
    ("dft", {"SGT_TSHIFT_IMPL": "dft"}),
    ("circconv", {"SGT_TSHIFT_IMPL": "dft", "SGT_SGCN_IMPL": "circconv"}),
]

BASE_ENV_KEYS = ("SGT_TSHIFT_IMPL", "SGT_SGCN_IMPL")


def set_env(env):
    for k in BASE_ENV_KEYS:
        os.environ.pop(k, None)
    os.environ.update(env)


def main():
    import jax
    import jax.numpy as jnp

    from shift_gcn_tpu.models.shift_gcn import ModelConfig
    from shift_gcn_tpu.train.optim import build_weight_decay_tree
    from shift_gcn_tpu.train.state import create_train_state, make_train_step

    print(f"devices: {jax.devices()}", flush=True)
    # sanity: real compute, pinned precision (CLAUDE.md bf16-default gotcha)
    rng = np.random.default_rng(1234)
    a = rng.standard_normal((128, 128)).astype(np.float32)
    got = np.asarray(jnp.matmul(jnp.asarray(a), jnp.asarray(a),
                                precision="highest"))
    assert np.allclose(got, a @ a, atol=1e-2), "zombie worker"
    print("sanity ok", flush=True)

    rng = np.random.default_rng(0)
    host_batch = {
        "data": rng.standard_normal((BATCH, 3, T, 33, 1)).astype(np.float32),
        "label": rng.integers(0, 2, BATCH).astype(np.int32),
    }
    lr = jnp.asarray(0.1, jnp.float32)

    steps = {}
    states = {}
    for name, env in CONFIGS:
        set_env(env)
        cfg = ModelConfig(num_class=2, num_point=33, num_person=1,
                          graph="mediapipe_pose",
                          activation_dtype="bfloat16")
        state = create_train_state(jax.random.key(0), cfg)
        wd = build_weight_decay_tree(state.params)
        step = jax.jit(make_train_step(cfg, wd), donate_argnums=(0,))
        t0 = time.perf_counter()
        for _ in range(2):  # compile + warmup, like bench.py
            state, metrics = step(state, jax.device_put(host_batch), lr)
        jax.block_until_ready(metrics)
        print(f"[{name}] compile+warmup {time.perf_counter()-t0:.1f} s "
              f"loss={float(metrics['loss']):.4f}", flush=True)
        steps[name] = step
        states[name] = state

    results = {name: [] for name, _ in CONFIGS}
    for r in range(ROUNDS):
        for name, env in CONFIGS:
            set_env(env)  # no-op for timing; keeps any lazy reads honest
            step, state = steps[name], states[name]
            with ThreadPoolExecutor(max_workers=1) as pool:
                t0 = time.perf_counter()
                pending = pool.submit(jax.device_put, host_batch)
                for _ in range(STEPS):
                    batch = pending.result()
                    pending = pool.submit(jax.device_put, host_batch)
                    state, metrics = step(state, batch, lr)
                jax.block_until_ready(metrics)
                dt = time.perf_counter() - t0
            states[name] = state
            cps = STEPS * BATCH / dt
            results[name].append(round(cps, 1))
            print(f"round {r} [{name}] {cps:.1f} clips/s "
                  f"({dt/STEPS*1000:.1f} ms/step)", flush=True)

    print("== summary ==", flush=True)
    for name, vals in results.items():
        arr = np.asarray(vals)
        print(f"{name}: reps={vals} mean={arr.mean():.1f} "
              f"min={arr.min():.1f} max={arr.max():.1f} "
              f"spread={(arr.max()-arr.min())/arr.mean()*100:.1f}%",
              flush=True)
    print(json.dumps(results), flush=True)
    print("probe34 complete", flush=True)


if __name__ == "__main__":
    main()
