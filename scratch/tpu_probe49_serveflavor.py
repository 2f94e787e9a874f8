"""Probe 49: serving artifact flavor A/B — baked weights (constants) vs
params-as-inputs (hot-swappable) vs live jit.  queue48 measured baked at
904 clips/s vs live 1366; if the inputs flavor closes the gap, flip
export_checkpoint's default.

Run:  cd /root/repo && nohup python scratch/tpu_probe49_serveflavor.py \
          > scratch/queue49.log 2>&1 & echo $! > scratch/queue49.pid
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

BATCH, T, ITERS, ROUNDS = 64, 300, 20, 3


def main():
    import jax
    import jax.numpy as jnp

    from shift_gcn_tpu.inference.export import (export_eval,
                                                export_eval_baked,
                                                load_exported)
    from shift_gcn_tpu.models.shift_gcn import (ModelConfig, apply,
                                                init_params)

    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(1234)
    a = rng.standard_normal((128, 128)).astype(np.float32)
    got = np.asarray(jnp.matmul(jnp.asarray(a), jnp.asarray(a),
                                precision="highest"))
    assert np.allclose(got, a @ a, atol=1e-2), "zombie worker"
    print("sanity ok", flush=True)

    cfg = ModelConfig(num_class=2, num_point=33, num_person=1,
                      graph="mediapipe_pose", activation_dtype="bfloat16")
    params, bn_state = init_params(jax.random.key(0), cfg)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (BATCH, 3, T, 33, 1)), jnp.float32)

    fns = {}
    t0 = time.perf_counter()
    baked = load_exported(export_eval_baked(params, bn_state, cfg,
                                            BATCH, T))
    fns["baked"] = jax.jit(baked.call)
    out = fns["baked"](x); jax.block_until_ready(out)
    print(f"[baked] export+compile {time.perf_counter()-t0:.1f} s",
          flush=True)

    t0 = time.perf_counter()
    hot = load_exported(export_eval(params, bn_state, cfg, BATCH, T))
    fns["inputs"] = jax.jit(lambda xx: hot.call(params, bn_state, xx))
    out = fns["inputs"](x); jax.block_until_ready(out)
    print(f"[inputs] export+compile {time.perf_counter()-t0:.1f} s",
          flush=True)

    t0 = time.perf_counter()
    fns["live"] = jax.jit(lambda xx: apply(params, bn_state, xx, cfg,
                                           training=False)[0])
    out = fns["live"](x); jax.block_until_ready(out)
    print(f"[live] compile {time.perf_counter()-t0:.1f} s", flush=True)

    results = {k: [] for k in fns}
    for r in range(ROUNDS):
        for name, fn in fns.items():
            t0 = time.perf_counter()
            for _ in range(ITERS):
                out = fn(x)
            jax.block_until_ready(out)
            cps = ITERS * BATCH / (time.perf_counter() - t0)
            results[name].append(round(cps, 1))
            print(f"round {r} [{name}] {cps:.1f} clips/s", flush=True)
    print("== summary ==", flush=True)
    for name, vals in results.items():
        print(f"{name}: median={float(np.median(vals)):.1f} reps={vals}",
              flush=True)
    print("probe49 complete", flush=True)


if __name__ == "__main__":
    main()
