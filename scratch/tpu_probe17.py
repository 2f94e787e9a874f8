"""Probe 17: matmul-precision impact + tiny-T eval under matmul lowering.

The platform's default matmul precision changed to bf16 (2026-08-18).
Quantify default-vs-highest on the full model, then (LAST — crash risk)
check whether the matmul temporal-shift lowering survives the tiny-T eval
graph that faults the worker under the conv/slice lowerings.

  nohup python scratch/tpu_probe17.py > scratch/probe17.log 2>&1 &
"""
import os
import time
import numpy as np

os.environ.setdefault("SGT_SGCN_IMPL", "circconv")


def main():
    import jax, jax.numpy as jnp
    a = np.random.default_rng(0).standard_normal((128, 128)).astype(np.float32)
    got = np.asarray(jnp.matmul(jnp.asarray(a), jnp.asarray(a),
                                precision="highest"))
    assert np.allclose(got, a @ a, atol=1e-2)
    print("health ok", flush=True)

    from shift_gcn_tpu.models.shift_gcn import ModelConfig, apply
    from shift_gcn_tpu.train.optim import build_weight_decay_tree
    from shift_gcn_tpu.train.state import create_train_state, make_train_step

    rng = np.random.default_rng(0)
    cfg = ModelConfig(num_class=2, num_point=33, num_person=1,
                      graph="mediapipe_pose")
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

    def measure(tag, train=True):
        try:
            if train:
                step = jax.jit(make_train_step(cfg, wd))
                dt = timeit(lambda s, b: step(s, b, lr)[1]["loss"],
                            state0, batch)
            else:
                fwd = jax.jit(lambda p, s, xx: apply(p, s, xx, cfg,
                                                     training=False)[0])
                dt = timeit(fwd, state0.params, state0.bn_state,
                            batch["data"])
            kind = "train" if train else "eval "
            print(f"{kind} {tag}: {64/dt:.1f} clips/s ({dt*1000:.1f} ms)",
                  flush=True)
        except Exception as e:
            print(f"{tag}: FAILED {str(e)[:160]}", flush=True)

    for prec in ("default", "highest", "high"):
        if prec != "default":
            jax.config.update("jax_default_matmul_precision", prec)
        for impl in ("conv", "matmul"):
            os.environ["SGT_TSHIFT_IMPL"] = impl
            measure(f"{impl} prec={prec}", train=True)
            measure(f"{impl} prec={prec}", train=False)
    jax.config.update("jax_default_matmul_precision", "default")

    # whole-backbone bf16 activations under the new platform default
    os.environ["SGT_TSHIFT_IMPL"] = "conv"
    cfg_act16 = ModelConfig(num_class=2, num_point=33, num_person=1,
                            graph="mediapipe_pose",
                            activation_dtype="bfloat16")
    state16 = create_train_state(jax.random.key(0), cfg_act16)
    wd16 = build_weight_decay_tree(state16.params)
    try:
        step = jax.jit(make_train_step(cfg_act16, wd16))
        dt = timeit(lambda s, b: step(s, b, lr)[1]["loss"], state16, batch)
        print(f"train act-bf16 conv: {64/dt:.1f} clips/s ({dt*1000:.1f} ms)",
              flush=True)
        fwd = jax.jit(lambda p, s, xx: apply(p, s, xx, cfg_act16,
                                             training=False)[0])
        dt = timeit(fwd, state16.params, state16.bn_state, batch["data"])
        print(f"eval  act-bf16 conv: {64/dt:.1f} clips/s ({dt*1000:.1f} ms)",
              flush=True)
    except Exception as e:
        print(f"act-bf16: FAILED {str(e)[:160]}", flush=True)

    # LAST (worker-fault risk): tiny-T eval graph under the matmul lowering
    os.environ["SGT_TSHIFT_IMPL"] = "matmul"
    x_small = jnp.asarray(rng.standard_normal((8, 3, 64, 33, 1)), jnp.float32)
    try:
        fwd = jax.jit(lambda p, s, xx: apply(p, s, xx, cfg,
                                             training=False)[0])
        out = fwd(state0.params, state0.bn_state, x_small)
        jax.block_until_ready(out)
        print(f"tiny-T eval (T=64, matmul): OK {np.asarray(out)[0]}",
              flush=True)
    except Exception as e:
        print(f"tiny-T eval (T=64, matmul): FAILED {str(e)[:160]}",
              flush=True)
    print("probe17 complete", flush=True)


if __name__ == "__main__":
    main()
