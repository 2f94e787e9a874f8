"""Probe 2: batch scaling + remat, slice-impl eval, small-T crash last."""

import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)
    t0 = time.time()
    print("health:", float((jnp.ones((256, 256)) @ jnp.ones((256, 256))).sum()),
          f"({time.time()-t0:.1f}s)", flush=True)

    from shift_gcn_tpu.models.shift_gcn import ModelConfig, init_params, apply
    from shift_gcn_tpu.train.optim import build_weight_decay_tree
    from shift_gcn_tpu.train.state import create_train_state, make_train_step

    rng = np.random.default_rng(0)

    def timeit(fn, *args, steps=10):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / steps

    for batch_size, remat in ((128, False), (256, True)):
        try:
            cfg = ModelConfig(num_class=2, num_point=33, num_person=1,
                              graph="mediapipe_pose", remat=remat)
            state = create_train_state(jax.random.key(0), cfg)
            wd = build_weight_decay_tree(state.params)
            step = jax.jit(make_train_step(cfg, wd))
            batch = {
                "data": jnp.asarray(rng.standard_normal(
                    (batch_size, 3, 300, 33, 1)), jnp.float32),
                "label": jnp.asarray(
                    rng.integers(0, 2, batch_size), jnp.int32),
            }
            lr = jnp.asarray(0.1, jnp.float32)
            dt = timeit(lambda s, b: step(s, b, lr)[1]["loss"],
                        state, batch)
            print(f"train b={batch_size} remat={remat}: "
                  f"{batch_size/dt:.1f} clips/s", flush=True)
        except Exception as e:
            print(f"train b={batch_size} remat={remat} FAILED: "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)

    os.environ["SGT_TSHIFT_IMPL"] = "slice"
    cfg = ModelConfig(num_class=2, num_point=33, num_person=1,
                      graph="mediapipe_pose")
    params, bn = init_params(jax.random.key(0), cfg)
    x = jnp.asarray(rng.standard_normal((64, 3, 300, 33, 1)), jnp.float32)
    fwd = jax.jit(lambda p, s, xx: apply(p, s, xx, cfg, training=False)[0])
    dt = timeit(fwd, params, bn, x)
    print(f"eval slice impl (64,300): {64/dt:.1f} clips/s", flush=True)

    # crash candidates last
    x32 = jnp.asarray(rng.standard_normal((16, 3, 32, 33, 1)), jnp.float32)
    f32 = jax.jit(lambda p, s, xx, _i="slice": apply(
        p, s, xx, cfg, training=False)[0])
    print("T=32 eval slice:", np.asarray(f32(params, bn, x32))[0], flush=True)

    os.environ["SGT_TSHIFT_IMPL"] = "conv"
    f32c = jax.jit(lambda p, s, xx, _i="conv": apply(
        p, s, xx, cfg, training=False)[0])
    print("T=32 eval conv:", np.asarray(f32c(params, bn, x32))[0], flush=True)


if __name__ == "__main__":
    main()
