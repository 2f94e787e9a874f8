"""Probe 37: eval-only A/B of SGT_TCN_FREQ_FUSE (probe36 showed train a
wash but eval +3.5% on clean rounds with occasional platform dips —
resolve with 10 interleaved eval reps per config, idle host).

Run:  cd /root/repo && nohup python scratch/tpu_probe37_evalfuse.py \
          > scratch/queue37.log 2>&1 & echo $! > scratch/queue37.pid
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

BATCH, T, ROUNDS = 64, 300, 10
CONFIGS = [("base", "0"), ("freqfuse", "1")]


def main():
    import jax
    import jax.numpy as jnp

    from shift_gcn_tpu.models.shift_gcn import ModelConfig, apply
    from shift_gcn_tpu.train.state import create_train_state

    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(1234)
    a = rng.standard_normal((128, 128)).astype(np.float32)
    got = np.asarray(jnp.matmul(jnp.asarray(a), jnp.asarray(a),
                                precision="highest"))
    assert np.allclose(got, a @ a, atol=1e-2), "zombie worker"
    print("sanity ok", flush=True)

    rng = np.random.default_rng(0)
    x_host = rng.standard_normal((BATCH, 3, T, 33, 1)).astype(np.float32)

    fns = {}
    for name, flag in CONFIGS:
        os.environ["SGT_TCN_FREQ_FUSE"] = flag
        cfg = ModelConfig(num_class=2, num_point=33, num_person=1,
                          graph="mediapipe_pose",
                          activation_dtype="bfloat16")
        state = create_train_state(jax.random.key(0), cfg)
        fwd = jax.jit(lambda p, s, xx, c=cfg: apply(
            p, s, xx, c, training=False)[0])
        xe = jax.device_put(x_host)
        t0 = time.perf_counter()
        out = fwd(state.params, state.bn_state, xe)
        jax.block_until_ready(out)
        print(f"[{name}] compile {time.perf_counter()-t0:.1f} s "
              f"logit0={float(out[0, 0]):.4f}", flush=True)
        fns[name] = (fwd, state, xe)

    results = {name: [] for name, _ in CONFIGS}
    for r in range(ROUNDS):
        for name, flag in CONFIGS:
            os.environ["SGT_TCN_FREQ_FUSE"] = flag
            fwd, state, xe = fns[name]
            t0 = time.perf_counter()
            for _ in range(20):
                out = fwd(state.params, state.bn_state, xe)
            jax.block_until_ready(out)
            cps = 20 * BATCH / (time.perf_counter() - t0)
            results[name].append(round(cps, 1))
            print(f"round {r} [{name}] eval {cps:.1f} clips/s", flush=True)

    print("== summary ==", flush=True)
    for name, vals in results.items():
        arr = np.asarray(vals)
        print(f"{name}: median={np.median(arr):.1f} "
              f"range={arr.min():.1f}-{arr.max():.1f}", flush=True)
    print(json.dumps(results), flush=True)
    print("probe37 complete", flush=True)


if __name__ == "__main__":
    main()
