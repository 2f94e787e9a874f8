"""Post-circconv cost breakdown + fourstream step timing."""
import os
import time
import numpy as np


def main():
    import importlib
    import jax, jax.numpy as jnp
    a = np.random.default_rng(1).standard_normal((128, 128)).astype(np.float32)
    got = np.asarray(jnp.asarray(a) @ jnp.asarray(a))
    if not np.allclose(got, a @ a, atol=1e-2):
        print("UNHEALTHY WORKER — aborting", flush=True)
        return
    print("health: ok", flush=True)
    ts_mod = importlib.import_module("shift_gcn_tpu.ops.temporal_shift")
    bn_mod = importlib.import_module("shift_gcn_tpu.ops.batchnorm")
    from shift_gcn_tpu.graphs import get_graph
    from shift_gcn_tpu.models.shift_gcn import ModelConfig, apply
    from shift_gcn_tpu.models import shift_gcn as m
    from shift_gcn_tpu.train import fourstream as fs
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

    def measure_train(tag):
        step = jax.jit(make_train_step(cfg, wd))
        dt = timeit(lambda s, b: step(s, b, lr)[1]["loss"], state0, batch)
        print(f"train {tag}: {64/dt:.1f} clips/s ({dt*1000:.1f} ms)",
              flush=True)

    measure_train("baseline (circconv+xz)")

    # bf16 activations (halved HBM traffic on a bandwidth-bound model)
    cfg16 = ModelConfig(num_class=2, num_point=33, num_person=1,
                        graph="mediapipe_pose", activation_dtype="bfloat16")
    step16 = jax.jit(make_train_step(cfg16, wd))
    dt = timeit(lambda s, b: step16(s, b, lr)[1]["loss"], state0, batch)
    print(f"train act-bf16: {64/dt:.1f} clips/s ({dt*1000:.1f} ms)",
          flush=True)
    fwd16 = jax.jit(lambda p, s, xx: apply(p, s, xx, cfg16,
                                           training=False)[0])
    dt = timeit(fwd16, state0.params, state0.bn_state, batch["data"])
    print(f"eval  act-bf16: {64/dt:.1f} clips/s ({dt*1000:.1f} ms)",
          flush=True)

    # ablations under the new default
    orig_ts = ts_mod.temporal_shift

    def ident_shift(x, xpos, ypos, stride=1):
        return x[:, ::stride] if stride != 1 else x
    for mod in (ts_mod, m):
        mod.temporal_shift = ident_shift
    measure_train("no temporal shift")
    for mod in (ts_mod, m):
        mod.temporal_shift = orig_ts

    orig_bn = bn_mod.batch_norm

    def ident_bn(x, params, state, *, reduce_axes, training, momentum=0.1,
                 eps=1e-5, axis_name=None):
        return x, state
    bn_mod.batch_norm = ident_bn
    m.batch_norm = ident_bn
    measure_train("no batchnorm")
    bn_mod.batch_norm = orig_bn
    m.batch_norm = orig_bn

    ss = importlib.import_module("shift_gcn_tpu.ops.spatial_shift")
    orig_tr = ss.shift_gcn_transform

    def ident_transform(x, w, b, fm, compute_dtype=None):
        out = jnp.einsum("...vc,cd->...vd", x, w)
        return out + b.reshape((1,) * (out.ndim - 1) + (-1,))
    ss.shift_gcn_transform = ident_transform
    m.shift_gcn_transform = ident_transform
    measure_train("spatial = plain matmul (no circconv fold)")
    ss.shift_gcn_transform = orig_tr
    m.shift_gcn_transform = orig_tr

    # fourstream step
    graph = get_graph(cfg.graph)
    state4 = fs.create_fourstream_state(jax.random.key(0), cfg)
    step4 = jax.jit(fs.make_fourstream_train_step(cfg, wd, graph))
    dt = timeit(lambda s, b: step4(s, b, lr)[1]["loss"], state4, batch)
    print(f"fourstream train: {4*64/dt:.1f} stream-clips/s "
          f"({dt*1000:.1f} ms/step)", flush=True)

    # fourstream eval
    eval4 = jax.jit(fs.make_fourstream_eval_step(cfg, graph))
    dt = timeit(lambda p, s, b: eval4(p, s, b)[1],
                state4.params, state4.bn_state, batch)
    print(f"fourstream eval: {4*64/dt:.1f} stream-clips/s "
          f"({dt*1000:.1f} ms)", flush=True)
    print("probe14 complete", flush=True)


if __name__ == "__main__":
    main()
