"""Probe 18: Pallas kernels composed into the FULL model, measured.

Usage: python scratch/tpu_probe18.py <spatial|temporal|both>
(one group per process; a platform fault poisons later cases in-process)
"""
import os
import sys
import time
import numpy as np

os.environ.setdefault("SGT_SGCN_IMPL", "circconv")


def main(group):
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
    use_pallas_spatial = group in ("spatial", "both")
    if group in ("temporal", "both"):
        os.environ["SGT_TSHIFT_IMPL"] = "pallas"
    cfg = ModelConfig(num_class=2, num_point=33, num_person=1,
                      graph="mediapipe_pose", use_pallas=use_pallas_spatial)
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

    # correctness cross-check on a small slice vs the non-pallas graph
    cfg_ref = ModelConfig(num_class=2, num_point=33, num_person=1,
                          graph="mediapipe_pose")
    small = batch["data"][:8]
    ts_impl = os.environ.pop("SGT_TSHIFT_IMPL", None)
    want = np.asarray(jax.jit(
        lambda p, s, xx: apply(p, s, xx, cfg_ref, training=False)[0])(
            state0.params, state0.bn_state, small))
    if ts_impl:
        os.environ["SGT_TSHIFT_IMPL"] = ts_impl
    got = np.asarray(jax.jit(
        lambda p, s, xx: apply(p, s, xx, cfg, training=False)[0])(
            state0.params, state0.bn_state, small))
    err = float(np.max(np.abs(got - want)))
    print(f"eval parity vs default graph: max|diff|={err:.2e}", flush=True)

    fwd = jax.jit(lambda p, s, xx: apply(p, s, xx, cfg, training=False)[0])
    dt = timeit(fwd, state0.params, state0.bn_state, batch["data"])
    print(f"eval  pallas[{group}]: {64/dt:.1f} clips/s ({dt*1000:.1f} ms)",
          flush=True)

    step = jax.jit(make_train_step(cfg, wd))
    dt = timeit(lambda s, b: step(s, b, lr)[1]["loss"], state0, batch)
    print(f"train pallas[{group}]: {64/dt:.1f} clips/s ({dt*1000:.1f} ms)",
          flush=True)
    print(f"probe18 {group} complete", flush=True)


if __name__ == "__main__":
    main(sys.argv[1])
