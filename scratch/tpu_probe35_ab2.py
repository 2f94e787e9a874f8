"""Probe 35: probe34 rerun on an IDLE host (probe34's rounds were polluted
by concurrent pytest/smoke-train runs starving the host-side device_put
prefetch thread — throughput decayed monotonically for ALL configs).

conv vs dft temporal lowering only, 6 interleaved rounds, driver protocol.
Preamble doubles as the verify-skill TPU hardware smoke: jit the op on the
TPU, check device + the constraint backward |gy| == 0.01.

Run:  cd /root/repo && nohup python scratch/tpu_probe35_ab2.py \
          > scratch/queue35.log 2>&1 & echo $! > scratch/queue35.pid
"""
import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

BATCH, T, STEPS, ROUNDS = 64, 300, 20, 6
CONFIGS = [("conv", "conv"), ("dft", "dft")]


def main():
    import jax
    import jax.numpy as jnp

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

    # --- verify-skill TPU hardware smoke: constraint backward on-device ---
    from shift_gcn_tpu.ops.temporal_shift import temporal_shift

    x = jnp.asarray(rng.standard_normal((2, 32, 4, 8)), jnp.float32)
    ypos = jnp.asarray(rng.uniform(-0.9, 0.9, 8), jnp.float32)
    xpos = jnp.zeros(8, jnp.float32)

    def f(yp):
        return jnp.sum(temporal_shift(x, xpos, yp, stride=1) ** 2)

    out = jax.jit(temporal_shift, static_argnames="stride")(
        x, xpos, ypos, stride=1)
    print(f"tshift out device: {list(out.devices())}", flush=True)
    gy = jax.jit(jax.grad(f))(ypos)
    mags = np.abs(np.asarray(gy))
    print(f"constraint |gy| values: {np.unique(mags)}", flush=True)
    assert np.all(np.isclose(mags, 0.01, atol=1e-6)
                  | np.isclose(mags, 0.0001, atol=1e-6)), mags
    print("TPU smoke ok (constraint backward fixed-magnitude)", flush=True)

    rng = np.random.default_rng(0)
    host_batch = {
        "data": rng.standard_normal((BATCH, 3, T, 33, 1)).astype(np.float32),
        "label": rng.integers(0, 2, BATCH).astype(np.int32),
    }
    lr = jnp.asarray(0.1, jnp.float32)

    steps, states = {}, {}
    for name, impl in CONFIGS:
        os.environ["SGT_TSHIFT_IMPL"] = impl
        cfg = ModelConfig(num_class=2, num_point=33, num_person=1,
                          graph="mediapipe_pose",
                          activation_dtype="bfloat16")
        state = create_train_state(jax.random.key(0), cfg)
        wd = build_weight_decay_tree(state.params)
        step = jax.jit(make_train_step(cfg, wd), donate_argnums=(0,))
        t0 = time.perf_counter()
        for _ in range(2):
            state, metrics = step(state, jax.device_put(host_batch), lr)
        jax.block_until_ready(metrics)
        print(f"[{name}] compile+warmup {time.perf_counter()-t0:.1f} s "
              f"loss={float(metrics['loss']):.4f}", flush=True)
        steps[name], states[name] = step, state

    results = {name: [] for name, _ in CONFIGS}
    for r in range(ROUNDS):
        for name, _ in CONFIGS:
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
              f"median={np.median(arr):.1f} min={arr.min():.1f} "
              f"max={arr.max():.1f}", flush=True)
    print(json.dumps(results), flush=True)
    print("probe35 complete", flush=True)


if __name__ == "__main__":
    main()
