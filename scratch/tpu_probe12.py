"""Measure circulant-conv spatial transform + maxshift variants on TPU."""
import os
import time
import numpy as np


def main():
    import importlib
    import jax, jax.numpy as jnp
    print("health:", float((jnp.ones((8, 8)) @ jnp.ones((8, 8))).sum()),
          flush=True)
    ts_mod = importlib.import_module("shift_gcn_tpu.ops.temporal_shift")
    from shift_gcn_tpu.models.shift_gcn import ModelConfig, apply
    from shift_gcn_tpu.train.optim import build_weight_decay_tree
    from shift_gcn_tpu.train.state import create_train_state, make_train_step

    rng = np.random.default_rng(0)
    cfg = ModelConfig(num_class=2, num_point=33, num_person=1,
                      graph="mediapipe_pose")
    cfg_bf16 = ModelConfig(num_class=2, num_point=33, num_person=1,
                           graph="mediapipe_pose", compute_dtype="bfloat16")
    batch = {"data": jnp.asarray(rng.standard_normal((64, 3, 300, 33, 1)),
                                 jnp.float32),
             "label": jnp.asarray(rng.integers(0, 2, 64), jnp.int32)}
    lr = jnp.asarray(0.1, jnp.float32)
    state0 = create_train_state(jax.random.key(0), cfg)
    wd = build_weight_decay_tree(state0.params)

    def timeit(fn, *a, steps=10):
        out = fn(*a); jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn(*a)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / steps

    def measure_train(tag, c=cfg):
        try:
            step = jax.jit(make_train_step(c, wd))
            dt = timeit(lambda s, b: step(s, b, lr)[1]["loss"], state0, batch)
            print(f"train {tag}: {64/dt:.1f} clips/s ({dt*1000:.1f} ms)",
                  flush=True)
        except Exception as e:
            print(f"train {tag}: FAILED {str(e)[:100]}", flush=True)
            raise SystemExit(1)

    def measure_eval(tag, c=cfg):
        try:
            fwd = jax.jit(lambda p, s, xx: apply(p, s, xx, c,
                                                 training=False)[0])
            dt = timeit(fwd, state0.params, state0.bn_state, batch["data"])
            print(f"eval  {tag}: {64/dt:.1f} clips/s ({dt*1000:.1f} ms)",
                  flush=True)
        except Exception as e:
            print(f"eval  {tag}: FAILED {str(e)[:100]}", flush=True)
            raise SystemExit(1)

    def setenv(sgcn="chain", maxshift=8):
        os.environ["SGT_SGCN_IMPL"] = sgcn
        os.environ["SGT_TSHIFT_IMPL"] = "conv"
        os.environ["SGT_SSHIFT_IMPL"] = "gather"
        ts_mod.ASSUME_XPOS_ZERO = True
        ts_mod.MAX_SHIFT = maxshift

    setenv(sgcn="circconv")
    measure_train("CIRCCONV xz")
    measure_eval("CIRCCONV xz")
    measure_train("CIRCCONV xz bf16", cfg_bf16)
    setenv(sgcn="circconv", maxshift=4)
    measure_train("CIRCCONV xz maxshift4")
    setenv(maxshift=4)
    measure_train("chain xz maxshift4")
    setenv()
    measure_eval("chain xz")
    print("probe12 complete", flush=True)


if __name__ == "__main__":
    main()
