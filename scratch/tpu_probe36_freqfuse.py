"""Probe 36: SGT_TCN_FREQ_FUSE A/B (VERDICT r2 item 3a) — the fused
frequency-domain shift_in + 1x1 pass vs the default dft composition.
Driver protocol, interleaved rounds, idle host required.  Also times the
eval graph for both.

Run:  cd /root/repo && nohup python scratch/tpu_probe36_freqfuse.py \
          > scratch/queue36.log 2>&1 & echo $! > scratch/queue36.pid
"""
import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

BATCH, T, STEPS, ROUNDS = 64, 300, 20, 5
CONFIGS = [("base", "0"), ("freqfuse", "1")]


def main():
    import jax
    import jax.numpy as jnp

    from shift_gcn_tpu.models.shift_gcn import ModelConfig, apply
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
    host_batch = {
        "data": rng.standard_normal((BATCH, 3, T, 33, 1)).astype(np.float32),
        "label": rng.integers(0, 2, BATCH).astype(np.int32),
    }
    lr = jnp.asarray(0.1, jnp.float32)

    steps, states, evals = {}, {}, {}
    for name, flag in CONFIGS:
        os.environ["SGT_TCN_FREQ_FUSE"] = flag
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
        print(f"[{name}] train compile+warmup {time.perf_counter()-t0:.1f} s "
              f"loss={float(metrics['loss']):.4f}", flush=True)
        fwd = jax.jit(lambda p, s, xx, c=cfg: apply(
            p, s, xx, c, training=False)[0])
        xe = jax.device_put(host_batch["data"])
        t0 = time.perf_counter()
        out = fwd(state.params, state.bn_state, xe)
        jax.block_until_ready(out)
        print(f"[{name}] eval compile {time.perf_counter()-t0:.1f} s",
              flush=True)
        steps[name], states[name], evals[name] = step, state, (fwd, xe)

    results = {name: [] for name, _ in CONFIGS}
    eresults = {name: [] for name, _ in CONFIGS}
    for r in range(ROUNDS):
        for name, flag in CONFIGS:
            os.environ["SGT_TCN_FREQ_FUSE"] = flag
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
            fwd, xe = evals[name]
            st = states[name]
            t0 = time.perf_counter()
            for _ in range(10):
                out = fwd(st.params, st.bn_state, xe)
            jax.block_until_ready(out)
            ecps = 10 * BATCH / (time.perf_counter() - t0)
            eresults[name].append(round(ecps, 1))
            print(f"round {r} [{name}] train {cps:.1f} "
                  f"({dt/STEPS*1000:.1f} ms) eval {ecps:.1f}", flush=True)

    print("== summary ==", flush=True)
    for name, _ in CONFIGS:
        tr = np.asarray(results[name])
        ev = np.asarray(eresults[name])
        print(f"{name}: train median={np.median(tr):.1f} "
              f"range={tr.min():.1f}-{tr.max():.1f} | "
              f"eval median={np.median(ev):.1f} "
              f"range={ev.min():.1f}-{ev.max():.1f}", flush=True)
    print(json.dumps({"train": results, "eval": eresults}), flush=True)
    print("probe36 complete", flush=True)


if __name__ == "__main__":
    main()
