"""Probe 27: make fourstream train fit on-chip — remat vs smaller batch.

probe26 bisect: fourstream train compiles at batch 16 but the helper dies
at batch 64 under every lowering — consistent with the 4-stream activation
footprint exceeding HBM at AOT allocation time.  Candidates: per-block
remat (config flag, ~10x less activation memory) or reduced batch.

  nohup bash scratch/run_queue27.sh > scratch/queue27.log 2>&1 &
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
    from shift_gcn_tpu.models.shift_gcn import ModelConfig
    from shift_gcn_tpu.train import fourstream as fs
    from shift_gcn_tpu.train.optim import build_weight_decay_tree

    rng = np.random.default_rng(0)
    graph = get_graph("mediapipe_pose")
    lr = jnp.asarray(0.1, jnp.float32)
    data = rng.standard_normal((64, 3, 300, 33, 1)).astype(np.float32)
    labels = rng.integers(0, 2, 64).astype(np.int32)

    def timeit(fn, *a, steps=10):
        out = fn(*a)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn(*a)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / steps

    def measure(tag, b, remat):
        cfg = ModelConfig(num_class=2, num_point=33, num_person=1,
                          graph="mediapipe_pose",
                          activation_dtype="bfloat16", remat=remat)
        batch = {"data": jnp.asarray(data[:b]),
                 "label": jnp.asarray(labels[:b])}
        try:
            state4 = fs.create_fourstream_state(jax.random.key(0), cfg)
            wd = build_weight_decay_tree(
                jax.tree_util.tree_map(lambda x: x[0], state4.params))
            step = jax.jit(fs.make_fourstream_train_step(cfg, wd, graph))
            dt = timeit(lambda s, bb: step(s, bb, lr)[1]["loss"],
                        state4, batch)
            print(f"{tag}: {4*b/dt:.1f} stream-clips/s ({dt*1000:.1f} ms)",
                  flush=True)
        except Exception as e:
            print(f"{tag}: FAILED {str(e)[:150]}", flush=True)

    measure("fourstream b64 remat", 64, True)
    measure("fourstream b32", 32, False)
    measure("fourstream b16", 16, False)
    measure("fourstream b32 remat", 32, True)
    print("probe27 complete", flush=True)


if __name__ == "__main__":
    main()
