"""One-shot TPU probe: health, timings for impl/dtype variants, then the
known-crasher shapes last. Run alone (chip is exclusive)."""

import os
import sys
import time

import numpy as np

IMPL = os.environ.get("SGT_TSHIFT_IMPL", "slice")


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

    results = {}
    for dtype in (None, "bfloat16"):
        cfg = ModelConfig(num_class=2, num_point=33, num_person=1,
                          graph="mediapipe_pose", compute_dtype=dtype)
        state = create_train_state(jax.random.key(0), cfg)
        wd = build_weight_decay_tree(state.params)
        step = jax.jit(make_train_step(cfg, wd))
        batch = {
            "data": jnp.asarray(
                rng.standard_normal((64, 3, 300, 33, 1)), jnp.float32),
            "label": jnp.asarray(rng.integers(0, 2, 64), jnp.int32),
        }
        lr = jnp.asarray(0.1, jnp.float32)
        t0 = time.time()
        dt = timeit(lambda s, b: step(s, b, lr)[1]["loss"], state, batch)
        results[f"train_{dtype}"] = 64 / dt
        print(f"train impl={IMPL} dtype={dtype}: {64/dt:.1f} clips/s "
              f"(compile+run took {time.time()-t0:.0f}s)", flush=True)

        fwd = jax.jit(lambda p, s, x: apply(p, s, x, cfg,
                                            training=False)[0])
        dt = timeit(fwd, state.params, state.bn_state, batch["data"])
        results[f"eval_{dtype}"] = 64 / dt
        print(f"eval  impl={IMPL} dtype={dtype}: {64/dt:.1f} clips/s",
              flush=True)

    # the small-T eval shape that faulted the worker with the conv impl
    cfg = ModelConfig(num_class=2, num_point=33, num_person=1,
                      graph="mediapipe_pose")
    params, bn = init_params(jax.random.key(0), cfg)
    x = jnp.asarray(rng.standard_normal((16, 3, 32, 33, 1)), jnp.float32)
    f = jax.jit(lambda p, s, x: apply(p, s, x, cfg, training=False)[0])
    out = np.asarray(f(params, bn, x))
    print("T=32 eval ok:", out[0], flush=True)
    print("RESULTS", results, flush=True)


if __name__ == "__main__":
    main()
