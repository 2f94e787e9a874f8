"""Probe 5: eval throughput pallas vs XLA; bench modes."""
import time
import numpy as np

def main():
    import jax, jax.numpy as jnp
    print("health:", float((jnp.ones((8,8))@jnp.ones((8,8))).sum()), flush=True)
    from shift_gcn_tpu.models.shift_gcn import ModelConfig, init_params, apply

    rng = np.random.default_rng(0)
    def timeit(fn, *a, steps=10):
        out = fn(*a); jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(steps): out = fn(*a)
        jax.block_until_ready(out)
        return (time.perf_counter()-t0)/steps

    x = jnp.asarray(rng.standard_normal((64,3,300,33,1)), jnp.float32)
    for use_pallas in (False, True):
        cfg = ModelConfig(num_class=2, num_point=33, num_person=1,
                          graph="mediapipe_pose", use_pallas=use_pallas)
        params, state = init_params(jax.random.key(0), cfg)
        try:
            fwd = jax.jit(lambda p,s,xx,_u=use_pallas: apply(p,s,xx,cfg,training=False)[0])
            dt = timeit(fwd, params, state, x)
            print(f"eval pallas={use_pallas}: {64/dt:.1f} clips/s", flush=True)
        except Exception as e:
            print(f"eval pallas={use_pallas} FAILED {type(e).__name__} {str(e)[:120]}", flush=True)

    # spmm kernel bench
    from shift_gcn_tpu.graphs import MEDIAPIPE_POSE
    from shift_gcn_tpu.ops.aggregate import dense_graph_aggregate
    g = MEDIAPIPE_POSE
    xb = jnp.asarray(rng.standard_normal((4096, 33, 64)), jnp.float32)
    adj = jnp.asarray(g.A)
    agg = jax.jit(lambda xx: dense_graph_aggregate(xx, adj))
    dt = timeit(agg, xb, steps=20)
    edges = int((g.A != 0).sum())
    print(f"spmm: {4096*edges/dt/1e9:.3f} Gedge/s", flush=True)

if __name__ == "__main__":
    main()
