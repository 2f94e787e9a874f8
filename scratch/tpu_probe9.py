import numpy as np
def main():
    import jax, jax.numpy as jnp
    print("health:", float((jnp.ones((8,8))@jnp.ones((8,8))).sum()), flush=True)
    from shift_gcn_tpu.models.shift_gcn import ModelConfig, BlockSpec, init_params, apply
    rng = np.random.default_rng(0)

    def case(name, f):
        try:
            out = f(); jax.block_until_ready(out)
            print(f"{name}: OK", flush=True)
            return True
        except Exception as e:
            print(f"{name}: FAILED {str(e)[:80]}", flush=True)
            return False

    cfg_t = ModelConfig(num_class=2, num_point=33, num_person=1,
                        graph="mediapipe_pose", use_pallas=True,
                        blocks=(BlockSpec(3, 8, residual=False),
                                BlockSpec(8, 16, stride=2)))
    pt, st = init_params(jax.random.key(0), cfg_t)
    xt = jnp.asarray(rng.standard_normal((4,3,300,33,1)), jnp.float32)
    ok = case("tiny model pallas eval", lambda: jax.jit(
        lambda p,s,xx: apply(p,s,xx,cfg_t,training=False)[0])(pt, st, xt))
    if not ok:
        return

    cfg_f = ModelConfig(num_class=2, num_point=33, num_person=1,
                        graph="mediapipe_pose", use_pallas=True)
    pf, sf = init_params(jax.random.key(0), cfg_f)
    xf = jnp.asarray(rng.standard_normal((64,3,300,33,1)), jnp.float32)
    ok = case("full model pallas eval", lambda: jax.jit(
        lambda p,s,xx: apply(p,s,xx,cfg_f,training=False)[0])(pf, sf, xf))
    if not ok:
        return

    # timing vs XLA
    import time
    def timeit(fn, *a, steps=10):
        out = fn(*a); jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(steps): out = fn(*a)
        jax.block_until_ready(out)
        return (time.perf_counter()-t0)/steps
    fwd_p = jax.jit(lambda p,s,xx: apply(p,s,xx,cfg_f,training=False)[0])
    dt = timeit(fwd_p, pf, sf, xf)
    print(f"eval pallas=True: {64/dt:.1f} clips/s", flush=True)

    cfg_x = ModelConfig(num_class=2, num_point=33, num_person=1, graph="mediapipe_pose")
    fwd_x = jax.jit(lambda p,s,xx: apply(p,s,xx,cfg_x,training=False)[0])
    dt = timeit(fwd_x, pf, sf, xf)
    print(f"eval pallas=False: {64/dt:.1f} clips/s", flush=True)

    # training step with pallas
    from shift_gcn_tpu.train.optim import build_weight_decay_tree
    from shift_gcn_tpu.train.state import create_train_state, make_train_step
    state = create_train_state(jax.random.key(0), cfg_f)
    wd = build_weight_decay_tree(state.params)
    step = jax.jit(make_train_step(cfg_f, wd))
    batch = {"data": xf, "label": jnp.asarray(rng.integers(0,2,64), jnp.int32)}
    lr = jnp.asarray(0.1, jnp.float32)
    try:
        dt = timeit(lambda s,b: step(s,b,lr)[1]["loss"], state, batch)
        print(f"train pallas=True: {64/dt:.1f} clips/s", flush=True)
    except Exception as e:
        print(f"train pallas=True FAILED {str(e)[:80]}", flush=True)
if __name__ == "__main__":
    main()
