"""Probe 44: host->device transfer dtype A/B for the train step.

Evidence so far: eval (no per-step transfers) is stable across hours
(1570-1578) while train (7.6 MB fp32 batch/step through the socket
relay) swings 308-396 — the relay IS the train-side variance.  Test:
transfer the batch as bf16 (3.8 MB) and cast back to fp32 on device
(numerics: input quantization only).  If train throughput in a slow
relay period improves materially, transfer compression is a real
framework knob.

Run:  cd /root/repo && nohup python scratch/tpu_probe44_transfer.py \
          > scratch/queue44.log 2>&1 & echo $! > scratch/queue44.pid
"""
import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

BATCH, T, STEPS, ROUNDS = 64, 300, 20, 5


def main():
    import jax
    import jax.numpy as jnp
    import ml_dtypes

    from shift_gcn_tpu.models.shift_gcn import ModelConfig
    from shift_gcn_tpu.train.optim import build_weight_decay_tree
    from shift_gcn_tpu.train.state import create_train_state, make_train_step

    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(1234)
    a = rng.standard_normal((128, 128)).astype(np.float32)
    got = np.asarray(jnp.matmul(jnp.asarray(a), jnp.asarray(a),
                                precision="highest"))
    assert np.allclose(got, a @ a, atol=1e-2), "zombie worker"
    print("sanity ok", flush=True)

    rng = np.random.default_rng(0)
    data32 = rng.standard_normal((BATCH, 3, T, 33, 1)).astype(np.float32)
    label = rng.integers(0, 2, BATCH).astype(np.int32)
    batches = {
        "fp32": {"data": data32, "label": label},
        "bf16": {"data": data32.astype(ml_dtypes.bfloat16),
                 "label": label},
    }
    lr = jnp.asarray(0.1, jnp.float32)

    cfg = ModelConfig(num_class=2, num_point=33, num_person=1,
                      graph="mediapipe_pose", activation_dtype="bfloat16")
    state0 = create_train_state(jax.random.key(0), cfg)
    wd = build_weight_decay_tree(state0.params)
    base_step = make_train_step(cfg, wd)

    def step_cast(state, batch, lr_):
        batch = dict(batch, data=batch["data"].astype(jnp.float32))
        return base_step(state, batch, lr_)

    steps = {"fp32": jax.jit(base_step, donate_argnums=(0,)),
             "bf16": jax.jit(step_cast, donate_argnums=(0,))}
    states = {}
    for name in ("fp32", "bf16"):
        st = create_train_state(jax.random.key(0), cfg)
        t0 = time.perf_counter()
        for _ in range(2):
            st, metrics = steps[name](st, jax.device_put(batches[name]), lr)
        jax.block_until_ready(metrics)
        print(f"[{name}] compile+warmup {time.perf_counter()-t0:.1f} s "
              f"loss={float(metrics['loss']):.4f}", flush=True)
        states[name] = st

    results = {"fp32": [], "bf16": []}
    for r in range(ROUNDS):
        for name in ("fp32", "bf16"):
            step, st, hb = steps[name], states[name], batches[name]
            with ThreadPoolExecutor(max_workers=1) as pool:
                t0 = time.perf_counter()
                pending = pool.submit(jax.device_put, hb)
                for _ in range(STEPS):
                    b = pending.result()
                    pending = pool.submit(jax.device_put, hb)
                    st, metrics = step(st, b, lr)
                jax.block_until_ready(metrics)
                dt = time.perf_counter() - t0
            states[name] = st
            cps = STEPS * BATCH / dt
            results[name].append(round(cps, 1))
            print(f"round {r} [{name}] {cps:.1f} clips/s "
                  f"({dt/STEPS*1000:.1f} ms/step)", flush=True)

    print("== summary ==", flush=True)
    for name, vals in results.items():
        arr = np.asarray(vals)
        print(f"{name}: median={np.median(arr):.1f} "
              f"range={arr.min():.1f}-{arr.max():.1f}", flush=True)
    print(json.dumps(results), flush=True)
    print("probe44 complete", flush=True)


if __name__ == "__main__":
    main()
