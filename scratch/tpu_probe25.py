"""Probe 25: fourstream compile/throughput after in-graph DFT factors.

probe24's fourstream graphs crashed the remote compile helper under BOTH
bnfold settings; suspect oversized MLIR from repeated dense DFT-factor
literals (the `_circulant_mask` failure mode).  Factors are now built
in-graph from iotas.  Control: fourstream with SGT_SGCN_IMPL=circconv.

  nohup bash scratch/run_queue25.sh > scratch/queue25.log 2>&1 &
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

    from shift_gcn_tpu.graphs import get_graph
    from shift_gcn_tpu.models.shift_gcn import ModelConfig, apply
    from shift_gcn_tpu.train import fourstream as fs
    from shift_gcn_tpu.train.optim import build_weight_decay_tree
    from shift_gcn_tpu.train.state import create_train_state, make_train_step

    rng = np.random.default_rng(0)
    batch = {"data": jnp.asarray(rng.standard_normal((64, 3, 300, 33, 1)),
                                 jnp.float32),
             "label": jnp.asarray(rng.integers(0, 2, 64), jnp.int32)}
    lr = jnp.asarray(0.1, jnp.float32)
    cfg16 = ModelConfig(num_class=2, num_point=33, num_person=1,
                        graph="mediapipe_pose", activation_dtype="bfloat16")
    graph = get_graph("mediapipe_pose")

    def timeit(fn, *a, steps=10):
        out = fn(*a)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn(*a)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / steps

    # single-stream sanity: in-graph factors should not change throughput
    for impl in ("dft",):
        os.environ["SGT_SGCN_IMPL"] = impl
        state = create_train_state(jax.random.key(0), cfg16)
        wd = build_weight_decay_tree(state.params)
        step = jax.jit(make_train_step(cfg16, wd))
        dt = timeit(lambda s, b: step(s, b, lr)[1]["loss"], state, batch)
        print(f"train {impl} (in-graph factors): {64/dt:.1f} clips/s "
              f"({dt*1000:.1f} ms)", flush=True)
        fwd = jax.jit(lambda p, s, xx: apply(p, s, xx, cfg16,
                                             training=False)[0])
        dt = timeit(fwd, state.params, state.bn_state, batch["data"])
        print(f"eval  {impl} (in-graph factors): {64/dt:.1f} clips/s "
              f"({dt*1000:.1f} ms)", flush=True)

    for impl in ("dft", "circconv"):
        os.environ["SGT_SGCN_IMPL"] = impl
        try:
            state4 = fs.create_fourstream_state(jax.random.key(0), cfg16)
            wd = build_weight_decay_tree(
                jax.tree_util.tree_map(lambda x: x[0], state4.params))
            step = jax.jit(fs.make_fourstream_train_step(cfg16, wd, graph))
            dt = timeit(lambda s, b: step(s, b, lr)[1]["loss"],
                        state4, batch)
            print(f"fourstream {impl}: {4*64/dt:.1f} stream-clips/s "
                  f"({dt*1000:.1f} ms)", flush=True)
        except Exception as e:
            print(f"fourstream {impl}: FAILED {str(e)[:200]}", flush=True)

    print("probe25 complete", flush=True)


if __name__ == "__main__":
    main()
