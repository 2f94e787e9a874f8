"""Probe 16: temporal-block breakdown + matmul shift lowering.

Safe cases only (no pallas-in-model, no tiny-T eval): run as ONE process.
  nohup python scratch/tpu_probe16.py > scratch/probe16.log 2>&1 &
"""
import os
import time
import numpy as np

os.environ.setdefault("SGT_SGCN_IMPL", "circconv")


def main():
    import importlib
    import jax, jax.numpy as jnp
    print("health:", float((jnp.ones((8, 8)) @ jnp.ones((8, 8))).sum()),
          flush=True)
    ts_mod = importlib.import_module("shift_gcn_tpu.ops.temporal_shift")
    from shift_gcn_tpu.models import shift_gcn as mmod
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

    def measure(tag, train=True, c=cfg):
        try:
            if train:
                step = jax.jit(make_train_step(c, wd))
                dt = timeit(lambda s, b: step(s, b, lr)[1]["loss"],
                            state0, batch)
            else:
                fwd = jax.jit(lambda p, s, xx: apply(p, s, xx, c,
                                                     training=False)[0])
                dt = timeit(fwd, state0.params, state0.bn_state,
                            batch["data"])
            kind = "train" if train else "eval "
            print(f"{kind} {tag}: {64/dt:.1f} clips/s ({dt*1000:.1f} ms)",
                  flush=True)
            return dt
        except Exception as e:
            print(f"{tag}: FAILED {str(e)[:160]}", flush=True)
            return None

    # --- lowering comparison -------------------------------------------
    os.environ["SGT_TSHIFT_IMPL"] = "conv"
    measure("conv baseline", train=True)
    measure("conv baseline", train=False)

    os.environ["SGT_TSHIFT_IMPL"] = "matmul"
    measure("MATMUL tshift", train=True)
    measure("MATMUL tshift", train=False)

    cfg_bf16 = ModelConfig(num_class=2, num_point=33, num_person=1,
                           graph="mediapipe_pose", compute_dtype="bfloat16")
    measure("MATMUL tshift bf16", train=True, c=cfg_bf16)
    measure("MATMUL tshift bf16", train=False, c=cfg_bf16)

    # matmul + TCN_FUSE interplay (fused 1x1 only applies to shift_in)
    os.environ["SGT_TCN_FUSE"] = "1"
    os.environ["SGT_TSHIFT_IMPL"] = "matmul"
    measure("MATMUL + TCNFUSE", train=True)
    os.environ["SGT_TCN_FUSE"] = "0"

    # --- temporal block component ablation (conv impl) ------------------
    os.environ["SGT_TSHIFT_IMPL"] = "conv"
    real_ts = ts_mod.temporal_shift
    real_bn = mmod.batch_norm

    def fake_shift(x, xpos, ypos, stride=1):
        return x[:, ::stride] if stride != 1 else x

    # no temporal shifts at all
    mmod_ts_name = None
    for name in ("temporal_shift",):
        if hasattr(mmod, name):
            mmod_ts_name = name
    try:
        setattr(mmod, "temporal_shift", fake_shift)
        measure("ABLATE tshift->slice", train=True)
    finally:
        setattr(mmod, "temporal_shift", real_ts)

    def fake_bn(x, params, state, **kw):
        return x, state

    try:
        mmod.batch_norm = fake_bn
        measure("ABLATE all bn->id", train=True)
    finally:
        mmod.batch_norm = real_bn

    print("probe16 complete", flush=True)


if __name__ == "__main__":
    main()
