"""Probe 52: re-measure near-threshold train options under the NEW
precise protocol (bf16 transfer -> ±1.5% spread).  Configs:

  A: defaults (batch 64)
  B: SGT_TCN_FREQ_FUSE=1 (fused pass in training too — probe36 called it
     a wash under ±8% noise)
  C: batch 96 (between the b64 optimum and the b128 HBM cliff)

Run:  cd /root/repo && nohup python scratch/tpu_probe52_precise.py \
          > scratch/queue52.log 2>&1 & echo $! > scratch/queue52.pid
"""
import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

T, STEPS, ROUNDS = 300, 20, 4
CONFIGS = [("default", {"batch": 64, "env": {}}),
           ("freqfuse-train", {"batch": 64,
                               "env": {"SGT_TCN_FREQ_FUSE": "1"}}),
           ("batch96", {"batch": 96, "env": {}})]


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
    runners = {}
    for name, spec in CONFIGS:
        os.environ.pop("SGT_TCN_FREQ_FUSE", None)
        os.environ.update(spec["env"])
        b = spec["batch"]
        cfg = ModelConfig(num_class=2, num_point=33, num_person=1,
                          graph="mediapipe_pose",
                          activation_dtype="bfloat16")
        state = create_train_state(jax.random.key(0), cfg)
        wd = build_weight_decay_tree(state.params)
        base = make_train_step(cfg, wd)

        def step_fn(s, batch, lr_, _base=base):
            return _base(s, dict(batch,
                                 data=batch["data"].astype(jnp.float32)),
                         lr_)

        step = jax.jit(step_fn, donate_argnums=(0,))
        hb = {"data": rng.standard_normal(
                  (b, 3, T, 33, 1)).astype(ml_dtypes.bfloat16),
              "label": rng.integers(0, 2, b).astype(np.int32)}
        lr = jnp.asarray(0.1, jnp.float32)
        try:
            t0 = time.perf_counter()
            for _ in range(2):
                state, m = step(state, jax.device_put(hb), lr)
            jax.block_until_ready(m)
            print(f"[{name}] compile+warmup {time.perf_counter()-t0:.1f} s"
                  f" loss={float(m['loss']):.4f}", flush=True)
        except Exception as e:
            print(f"[{name}] FAILED compile: {type(e).__name__} "
                  f"{str(e)[:150]}", flush=True)
            continue
        runners[name] = (step, state, hb, b, dict(spec["env"]))

    results = {name: [] for name in runners}
    lr = jnp.asarray(0.1, jnp.float32)
    for r in range(ROUNDS):
        for name, (step, state, hb, b, env) in runners.items():
            os.environ.pop("SGT_TCN_FREQ_FUSE", None)
            os.environ.update(env)
            with ThreadPoolExecutor(max_workers=1) as pool:
                t0 = time.perf_counter()
                pending = pool.submit(jax.device_put, hb)
                for _ in range(STEPS):
                    batch = pending.result()
                    pending = pool.submit(jax.device_put, hb)
                    state, m = step(state, batch, lr)
                jax.block_until_ready(m)
                dt = time.perf_counter() - t0
            runners[name] = (step, state, hb, b, env)
            cps = STEPS * b / dt
            results[name].append(round(cps, 1))
            print(f"round {r} [{name}] {cps:.1f} clips/s "
                  f"({dt/STEPS*1000:.1f} ms/step)", flush=True)

    print("== summary ==", flush=True)
    for name, vals in results.items():
        print(f"{name}: median={float(np.median(vals)):.1f} reps={vals}",
              flush=True)
    print(json.dumps(results), flush=True)
    print("probe52 complete", flush=True)


if __name__ == "__main__":
    main()
