import numpy as np
def main():
    import jax, jax.numpy as jnp
    print("health:", float((jnp.ones((8,8))@jnp.ones((8,8))).sum()), flush=True)
    import shift_gcn_tpu.ops.pallas.shift_gcn_kernel as pk
    rng = np.random.default_rng(0)

    def case(name, fn):
        try:
            out = fn(); jax.block_until_ready(out)
            print(f"{name}: OK", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {str(e)[:90]}", flush=True)

    # chain of two fused calls under one jit with reshapes like the model
    def chain():
        n, t, v = 4, 300, 33
        x = jnp.asarray(rng.standard_normal((n, t, v, 3)), jnp.float32)
        g1 = jnp.ones((v, 3), jnp.float32)
        w1 = jnp.asarray(rng.standard_normal((3, 64)), jnp.float32)
        g2 = jnp.ones((v, 64), jnp.float32)
        w2 = jnp.asarray(rng.standard_normal((64, 64)), jnp.float32)
        @jax.jit
        def f(x):
            h = pk.fused_shift_gcn(x.reshape(n*t, v, 3), g1, w1, jnp.zeros(64))
            h = h.reshape(n, t, v, 64)
            h = jax.nn.relu(h)
            h = pk.fused_shift_gcn(h.reshape(n*t, v, 64), g2, w2, jnp.zeros(64))
            return h.reshape(n, t, v, 64)
        return f(x)
    case("chain of 2", chain)

    # single fused call inside the real model with only l1 using pallas?
    # full eval model with pallas:
    from shift_gcn_tpu.models.shift_gcn import ModelConfig, BlockSpec, init_params, apply
    def tiny_model():
        cfg = ModelConfig(num_class=2, num_point=33, num_person=1,
                          graph="mediapipe_pose", use_pallas=True,
                          blocks=(BlockSpec(3, 8, residual=False),
                                  BlockSpec(8, 16, stride=2)))
        params, state = init_params(jax.random.key(0), cfg)
        x = jnp.asarray(rng.standard_normal((4,3,300,33,1)), jnp.float32)
        return jax.jit(lambda p,s,xx: apply(p,s,xx,cfg,training=False)[0])(params, state, x)
    case("tiny model pallas eval", tiny_model)

    def full_model():
        cfg = ModelConfig(num_class=2, num_point=33, num_person=1,
                          graph="mediapipe_pose", use_pallas=True)
        params, state = init_params(jax.random.key(0), cfg)
        x = jnp.asarray(rng.standard_normal((4,3,300,33,1)), jnp.float32)
        return jax.jit(lambda p,s,xx: apply(p,s,xx,cfg,training=False)[0])(params, state, x)
    case("full model pallas eval b4", full_model)
if __name__ == "__main__":
    main()
