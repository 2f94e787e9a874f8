"""Cost breakdown: train-step time with components ablated to identity."""
import time
import numpy as np

def main():
    import importlib
    import jax, jax.numpy as jnp
    print("health:", float((jnp.ones((8,8))@jnp.ones((8,8))).sum()), flush=True)
    ts_mod = importlib.import_module("shift_gcn_tpu.ops.temporal_shift")
    ss_mod = importlib.import_module("shift_gcn_tpu.ops.spatial_shift")
    bn_mod = importlib.import_module("shift_gcn_tpu.ops.batchnorm")
    from shift_gcn_tpu.models.shift_gcn import ModelConfig
    from shift_gcn_tpu.train.optim import build_weight_decay_tree
    from shift_gcn_tpu.train.state import create_train_state, make_train_step

    rng = np.random.default_rng(0)
    cfg = ModelConfig(num_class=2, num_point=33, num_person=1, graph="mediapipe_pose")
    batch = {"data": jnp.asarray(rng.standard_normal((64,3,300,33,1)), jnp.float32),
             "label": jnp.asarray(rng.integers(0,2,64), jnp.int32)}
    lr = jnp.asarray(0.1, jnp.float32)

    def timeit(fn, *a, steps=10):
        out = fn(*a); jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(steps): out = fn(*a)
        jax.block_until_ready(out)
        return (time.perf_counter()-t0)/steps

    def measure(tag):
        state = create_train_state(jax.random.key(0), cfg)
        wd = build_weight_decay_tree(state.params)
        step = jax.jit(make_train_step(cfg, wd))
        dt = timeit(lambda s,b: step(s,b,lr)[1]["loss"], state, batch)
        print(f"{tag}: {64/dt:.1f} clips/s ({dt*1000:.1f} ms/step)", flush=True)

    measure("baseline")

    orig_ts = ts_mod.temporal_shift
    def ident_shift(x, xpos, ypos, stride=1):
        return x[:, ::stride] if stride != 1 else x
    ts_mod.temporal_shift = ident_shift
    import shift_gcn_tpu.models.shift_gcn as m
    m.temporal_shift = ident_shift
    measure("no temporal shift")
    ts_mod.temporal_shift = orig_ts
    m.temporal_shift = orig_ts

    orig_ss = ss_mod.spatial_shift
    ss_mod.spatial_shift = lambda x, d: x
    measure("no spatial shift")
    ss_mod.spatial_shift = orig_ss

    orig_bn = bn_mod.batch_norm
    def ident_bn(x, params, state, *, reduce_axes, training, momentum=0.1, eps=1e-5, axis_name=None):
        return x, state
    bn_mod.batch_norm = ident_bn
    m.batch_norm = ident_bn
    measure("no batchnorm")
    bn_mod.batch_norm = orig_bn
    m.batch_norm = orig_bn

    # spatial shift via one-hot matmul instead of gather
    ss_mod.spatial_shift = ss_mod.spatial_shift_onehot
    measure("spatial shift via onehot-matmul")
    ss_mod.spatial_shift = orig_ss
if __name__ == "__main__":
    main()
