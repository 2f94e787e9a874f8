"""Probe 41: eval batch-size sweep at the CURRENT defaults (dft + bf16 +
BN_LP_EVAL + freq-fuse).  Round-2 measured eval b128/b256 SLOWER than b64
under the then-defaults; retest now that the eval graph changed.

Run:  cd /root/repo && nohup python scratch/tpu_probe41_evalbatch.py \
          > scratch/queue41.log 2>&1 & echo $! > scratch/queue41.pid
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

T, ROUNDS = 300, 3
BATCHES = [64, 128, 256]


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

    cfg = ModelConfig(num_class=2, num_point=33, num_person=1,
                      graph="mediapipe_pose", activation_dtype="bfloat16")
    state = create_train_state(jax.random.key(0), cfg)
    fwd = jax.jit(lambda p, s, xx: apply(p, s, xx, cfg,
                                         training=False)[0])
    rng = np.random.default_rng(0)
    xs = {}
    for b in BATCHES:
        try:
            xe = jax.device_put(rng.standard_normal(
                (b, 3, T, 33, 1)).astype(np.float32))
            t0 = time.perf_counter()
            out = fwd(state.params, state.bn_state, xe)
            jax.block_until_ready(out)
            print(f"[b{b}] compile {time.perf_counter()-t0:.1f} s",
                  flush=True)
            xs[b] = xe
        except Exception as e:
            print(f"[b{b}] FAILED compile: {type(e).__name__} "
                  f"{str(e)[:200]}", flush=True)

    results = {b: [] for b in xs}
    for r in range(ROUNDS):
        for b, xe in xs.items():
            n_iter = max(4, 1280 // b)
            t0 = time.perf_counter()
            for _ in range(n_iter):
                out = fwd(state.params, state.bn_state, xe)
            jax.block_until_ready(out)
            cps = n_iter * b / (time.perf_counter() - t0)
            results[b].append(round(cps, 1))
            print(f"round {r} [b{b}] {cps:.1f} clips/s", flush=True)

    print("== summary ==", flush=True)
    for b, vals in results.items():
        print(f"b{b}: median={float(np.median(vals)):.1f} reps={vals}",
              flush=True)
    print(json.dumps({str(k): v for k, v in results.items()}), flush=True)
    print("probe41 complete", flush=True)


if __name__ == "__main__":
    main()
