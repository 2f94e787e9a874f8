"""Probe 23: frequency-domain circulant (SGT_SGCN_IMPL=dft) vs circconv,
plus a refreshed component ablation at the current bf16-activation default.

The roofline (docs/PERF.md) says circconv's V-fold dead MACs run ~19 ms fwd
at the bf16 MXU rate — ~27%% of the 210 ms train step and ~34%% of the 56 ms
eval pass.  The dft lowering does the same math with ~16-25x fewer MACs.

  nohup bash scratch/run_queue23.sh > scratch/queue23.log 2>&1 &
"""
import os
import sys
import time
import numpy as np


def main():
    import importlib

    import jax
    import jax.numpy as jnp

    a = np.random.default_rng(0).standard_normal((128, 128)).astype(np.float32)
    got = np.asarray(jnp.matmul(jnp.asarray(a), jnp.asarray(a),
                                precision="highest"))
    assert np.allclose(got, a @ a, atol=1e-2)
    print("health ok", flush=True)

    from shift_gcn_tpu.models.shift_gcn import ModelConfig, apply
    from shift_gcn_tpu.train.optim import build_weight_decay_tree
    from shift_gcn_tpu.train.state import create_train_state, make_train_step

    rng = np.random.default_rng(0)
    batch = {"data": jnp.asarray(rng.standard_normal((64, 3, 300, 33, 1)),
                                 jnp.float32),
             "label": jnp.asarray(rng.integers(0, 2, 64), jnp.int32)}
    lr = jnp.asarray(0.1, jnp.float32)

    def timeit(fn, *a, steps=10):
        out = fn(*a)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn(*a)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / steps

    def measure(tag, cfg, train=True):
        try:
            state = create_train_state(jax.random.key(0), cfg)
            if train:
                wd = build_weight_decay_tree(state.params)
                step = jax.jit(make_train_step(cfg, wd))
                dt = timeit(lambda s, b: step(s, b, lr)[1]["loss"],
                            state, batch)
            else:
                fwd = jax.jit(lambda p, s, xx: apply(p, s, xx, cfg,
                                                     training=False)[0])
                dt = timeit(fwd, state.params, state.bn_state, batch["data"])
            kind = "train" if train else "eval "
            print(f"{kind} {tag}: {64/dt:.1f} clips/s ({dt*1000:.1f} ms)",
                  flush=True)
        except Exception as e:
            print(f"{tag}: FAILED {str(e)[:200]}", flush=True)

    cfg16 = ModelConfig(num_class=2, num_point=33, num_person=1,
                        graph="mediapipe_pose", activation_dtype="bfloat16")
    cfg32 = ModelConfig(num_class=2, num_point=33, num_person=1,
                        graph="mediapipe_pose")

    # correctness spot-check of the dft lowering on-device (bf16 + fp32)
    ss = importlib.import_module("shift_gcn_tpu.ops.spatial_shift")
    x = jnp.asarray(rng.standard_normal((4, 5, 33, 64)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((64, 64)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal((64,)), jnp.float32)
    fm = jnp.asarray(rng.standard_normal((1, 33, 64)), jnp.float32)
    cc = np.asarray(jax.jit(ss.shift_gcn_transform_circconv)(x, w, b, fm))
    df = np.asarray(jax.jit(ss.shift_gcn_transform_dft)(x, w, b, fm))
    print(f"dft-vs-circconv fp32 on-device max err: "
          f"{np.max(np.abs(cc - df)):.3e}", flush=True)
    dfb = np.asarray(jax.jit(ss.shift_gcn_transform_dft)(
        x.astype(jnp.bfloat16), w, b, fm)).astype(np.float32)
    print(f"dft bf16 vs fp32 max err: {np.max(np.abs(df - dfb)):.3e} "
          f"(scale {np.max(np.abs(df)):.2f})", flush=True)

    for impl in ("circconv", "dft"):
        os.environ["SGT_SGCN_IMPL"] = impl
        measure(f"{impl} act-bf16", cfg16, train=True)
        measure(f"{impl} act-bf16", cfg16, train=False)
    os.environ["SGT_SGCN_IMPL"] = "dft"
    measure("dft fp32", cfg32, train=True)
    measure("dft fp32", cfg32, train=False)

    # --- component ablation at the winning spatial impl, act-bf16 -------
    winner = sys.argv[1] if len(sys.argv) > 1 else "dft"
    os.environ["SGT_SGCN_IMPL"] = winner
    ts_mod = importlib.import_module("shift_gcn_tpu.ops.temporal_shift")
    bn_mod = importlib.import_module("shift_gcn_tpu.ops.batchnorm")
    m = importlib.import_module("shift_gcn_tpu.models.shift_gcn")

    measure(f"ablate-none ({winner})", cfg16, train=True)

    orig_ts = ts_mod.temporal_shift

    def ident_shift(x, xpos, ypos, stride=1):
        return x[:, ::stride] if stride != 1 else x

    ts_mod.temporal_shift = ident_shift
    m.temporal_shift = ident_shift
    measure("ablate temporal-shift", cfg16, train=True)
    measure("ablate temporal-shift", cfg16, train=False)
    ts_mod.temporal_shift = orig_ts
    m.temporal_shift = orig_ts

    orig_bn = bn_mod.batch_norm

    def ident_bn(x, params, state, *, reduce_axes, training,
                 momentum=0.1, eps=1e-5, axis_name=None):
        return x, state

    bn_mod.batch_norm = ident_bn
    m.batch_norm = ident_bn
    measure("ablate batchnorm", cfg16, train=True)
    measure("ablate batchnorm", cfg16, train=False)
    bn_mod.batch_norm = orig_bn
    m.batch_norm = orig_bn

    orig_tr = ss.shift_gcn_transform

    def ident_spatial(x, weight, bias, feature_mask, *, compute_dtype=None):
        if weight.shape[0] == weight.shape[1]:
            return x
        return jnp.einsum("...vc,cd->...vd", x, weight.astype(x.dtype))

    ss.shift_gcn_transform = ident_spatial
    m.shift_gcn_transform = ident_spatial
    measure("ablate spatial-transform", cfg16, train=True)
    measure("ablate spatial-transform", cfg16, train=False)
    ss.shift_gcn_transform = orig_tr
    m.shift_gcn_transform = orig_tr

    print("probe23 complete", flush=True)


if __name__ == "__main__":
    main()
