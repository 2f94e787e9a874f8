"""Probe 3: compiled Pallas kernel correctness + model train/eval throughput
with use_pallas on vs off."""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)
    t0 = time.time()
    print("health:", float((jnp.ones((256, 256)) @ jnp.ones((256, 256))).sum()),
          f"({time.time()-t0:.1f}s)", flush=True)

    # 1. kernel correctness compiled on TPU
    from shift_gcn_tpu.ops.pallas.shift_gcn_kernel import fused_shift_gcn
    from shift_gcn_tpu.ops.spatial_shift import shift_gcn_transform

    rng = np.random.default_rng(0)
    r, v, c, d = 300, 33, 64, 64
    x = jnp.asarray(rng.standard_normal((r, v, c)), jnp.float32)
    mask = jnp.asarray(rng.standard_normal((1, v, c)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((c, d)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((d,)), jnp.float32)
    want = np.asarray(shift_gcn_transform(
        x, w, b.reshape(1, 1, d), mask))
    gate = jnp.tanh(mask[0]) + 1.0
    got = np.asarray(jax.jit(fused_shift_gcn, static_argnums=4)(
        x, gate, w, b, 256))
    err = np.abs(got - want).max()
    print(f"pallas fwd max err vs XLA: {err:.2e}", flush=True)
    assert err < 1e-3

    # 2. end-to-end throughput
    from shift_gcn_tpu.models.shift_gcn import ModelConfig
    from shift_gcn_tpu.train.optim import build_weight_decay_tree
    from shift_gcn_tpu.train.state import create_train_state, make_train_step
    from shift_gcn_tpu.models.shift_gcn import apply

    def timeit(fn, *args, steps=10):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / steps

    batch = {
        "data": jnp.asarray(
            rng.standard_normal((64, 3, 300, 33, 1)), jnp.float32),
        "label": jnp.asarray(rng.integers(0, 2, 64), jnp.int32),
    }
    lr = jnp.asarray(0.1, jnp.float32)
    for use_pallas in (True, False):
        cfg = ModelConfig(num_class=2, num_point=33, num_person=1,
                          graph="mediapipe_pose", use_pallas=use_pallas)
        state = create_train_state(jax.random.key(0), cfg)
        wd = build_weight_decay_tree(state.params)
        step = jax.jit(make_train_step(cfg, wd))
        try:
            dt = timeit(lambda s, b_: step(s, b_, lr)[1]["loss"],
                        state, batch)
            print(f"train pallas={use_pallas}: {64/dt:.1f} clips/s",
                  flush=True)
        except Exception as e:
            print(f"train pallas={use_pallas} FAILED: "
                  f"{type(e).__name__}: {str(e)[:300]}", flush=True)
            continue
        fwd = jax.jit(lambda p, s, xx: apply(
            p, s, xx, cfg, training=False)[0])
        dt = timeit(fwd, state.params, state.bn_state, batch["data"])
        print(f"eval  pallas={use_pallas}: {64/dt:.1f} clips/s", flush=True)


if __name__ == "__main__":
    main()
