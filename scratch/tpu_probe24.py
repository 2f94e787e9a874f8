"""Probe 24: BN->shift->1x1 fold (SGT_TCN_BNFOLD) at the dft/bf16 default.

  nohup bash scratch/run_queue24.sh > scratch/queue24.log 2>&1 &
"""
import os
import time
import numpy as np


def main():
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

    # numeric spot-check of the fold on device (train-mode forward)
    from shift_gcn_tpu.models.shift_gcn import init_params

    cfgchk = ModelConfig(num_class=2, num_point=33, num_person=1,
                         graph="mediapipe_pose")
    params, st = init_params(jax.random.key(1), cfgchk)
    xs = jnp.asarray(rng.standard_normal((4, 3, 300, 33, 1)), jnp.float32)
    os.environ["SGT_TCN_BNFOLD"] = "0"
    ref = np.asarray(jax.jit(lambda p, s, xx: apply(
        p, s, xx, cfgchk, training=True)[0])(params, st, xs))
    os.environ["SGT_TCN_BNFOLD"] = "1"
    fold = np.asarray(jax.jit(lambda p, s, xx: apply(
        p, s, xx, cfgchk, training=True)[0])(params, st, xs))
    print(f"bnfold on-device max err: {np.max(np.abs(ref - fold)):.3e} "
          f"(scale {np.max(np.abs(ref)):.1f})", flush=True)

    for fold_on in ("0", "1"):
        os.environ["SGT_TCN_BNFOLD"] = fold_on
        measure(f"dft bnfold={fold_on}", cfg16, train=True)
        measure(f"dft bnfold={fold_on}", cfg16, train=False)

    # fourstream production step
    from shift_gcn_tpu.graphs import get_graph
    from shift_gcn_tpu.train import fourstream as fs

    graph = get_graph("mediapipe_pose")
    for fold_on in ("0", "1"):
        os.environ["SGT_TCN_BNFOLD"] = fold_on
        try:
            state4 = fs.create_fourstream_state(jax.random.key(0), cfg16)
            wd = build_weight_decay_tree(
                jax.tree_util.tree_map(lambda x: x[0], state4.params))
            step = jax.jit(fs.make_fourstream_train_step(cfg16, wd, graph))
            dt = timeit(lambda s, b: step(s, b, lr)[1]["loss"],
                        state4, batch)
            print(f"fourstream bnfold={fold_on}: "
                  f"{4*64/dt:.1f} stream-clips/s ({dt*1000:.1f} ms)",
                  flush=True)
        except Exception as e:
            print(f"fourstream bnfold={fold_on}: FAILED {str(e)[:200]}",
                  flush=True)

    print("probe24 complete", flush=True)


if __name__ == "__main__":
    main()
