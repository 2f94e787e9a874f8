"""Probe 50: params-as-jit-ARGUMENTS vs params-as-closure-CONSTANTS for
the eval forward, and the exported inputs-flavor artifact called with
runtime args.  probe49 saw all closure-constant variants at 1344 while
the args-passing eval bench reads ~1570 — if args-passing is the
difference, the serving recommendation is the params-as-inputs artifact
invoked with runtime weights.

Run:  cd /root/repo && nohup python scratch/tpu_probe50_closure.py \
          > scratch/queue50.log 2>&1 & echo $! > scratch/queue50.pid
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

    from shift_gcn_tpu.inference.export import export_eval, load_exported
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
    live_args = jax.jit(lambda p, s, xx: apply(p, s, xx, cfg,
                                               training=False)[0])
    fns["live-args"] = lambda: live_args(params, bn_state, x)
    live_const = jax.jit(lambda xx: apply(params, bn_state, xx, cfg,
                                          training=False)[0])
    fns["live-const"] = lambda: live_const(x)
    hot = load_exported(export_eval(params, bn_state, cfg, BATCH, T))
    art_args = jax.jit(hot.call)
    fns["artifact-args"] = lambda: art_args(params, bn_state, x)

    for name, fn in fns.items():
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        print(f"[{name}] compile {time.perf_counter()-t0:.1f} s",
              flush=True)

    results = {k: [] for k in fns}
    for r in range(ROUNDS):
        for name, fn in fns.items():
            t0 = time.perf_counter()
            for _ in range(ITERS):
                out = fn()
            jax.block_until_ready(out)
            cps = ITERS * BATCH / (time.perf_counter() - t0)
            results[name].append(round(cps, 1))
            print(f"round {r} [{name}] {cps:.1f} clips/s", flush=True)
    print("== summary ==", flush=True)
    for name, vals in results.items():
        print(f"{name}: median={float(np.median(vals)):.1f} reps={vals}",
              flush=True)
    print("probe50 complete", flush=True)


if __name__ == "__main__":
    main()
