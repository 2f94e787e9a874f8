import numpy as np
def main():
    import jax, jax.numpy as jnp
    print("health:", float((jnp.ones((8,8))@jnp.ones((8,8))).sum()), flush=True)
    import shift_gcn_tpu.ops.pallas.shift_gcn_kernel as pk
    from shift_gcn_tpu.ops.batchnorm import batch_norm, init_bn
    from shift_gcn_tpu.ops.temporal_shift import temporal_shift
    rng = np.random.default_rng(0)
    n, t, v, c = 4, 300, 33, 16
    x = jnp.asarray(rng.standard_normal((n, t, v, c)), jnp.float32)
    g = jnp.ones((v, c), jnp.float32)
    w = jnp.asarray(rng.standard_normal((c, c)), jnp.float32)
    b0 = jnp.zeros(c)
    bn_p, bn_s = init_bn(v * c)
    bn2_p, bn2_s = init_bn(c)
    xpos = jnp.zeros(c); ypos = jnp.asarray(np.linspace(-1,1,c), jnp.float32)

    def case(name, f, *a):
        try:
            out = jax.jit(f)(*a); jax.block_until_ready(out)
            print(f"{name}: OK", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {str(e)[:80]}", flush=True)

    def pallas_block(xx):
        return pk.fused_shift_gcn(xx.reshape(n*t, v, c), g, w, b0).reshape(n, t, v, c)

    # A: pallas + 1d BN eval (the gcn block's BN over V*C)
    def f_a(xx):
        h = pallas_block(xx)
        h2 = h.reshape(n*t, v*c)
        h2, _ = batch_norm(h2, bn_p, bn_s, reduce_axes=(0,), training=False)
        return h2.reshape(n, t, v, c)
    case("pallas+bn1d", f_a, x)

    # B: pallas + 2d BN eval
    def f_b(xx):
        h = pallas_block(xx)
        h, _ = batch_norm(h, bn2_p, bn2_s, reduce_axes=(0,1,2), training=False)
        return h
    case("pallas+bn2d", f_b, x)

    # C: pallas + temporal shift conv
    def f_c(xx):
        h = pallas_block(xx)
        return temporal_shift(h, xpos, ypos, 1)
    case("pallas+tshift", f_c, x)

    # D: pallas + stride-2 tshift
    def f_d(xx):
        h = pallas_block(xx)
        return temporal_shift(h, xpos, ypos, 2)
    case("pallas+tshift-s2", f_d, x)

    # E: data_bn-style transposes before pallas
    def f_e(xx):
        h = jnp.transpose(xx, (0, 2, 3, 1))          # (n, v, c, t)
        h = jnp.transpose(h, (0, 3, 1, 2))           # back to (n,t,v,c)
        return pallas_block(h)
    case("transposes+pallas", f_e, x)

    # F: full tiny block: bn2d -> pallas -> tshift -> bn2d + residual relu
    def f_f(xx):
        h, _ = batch_norm(xx, bn2_p, bn2_s, reduce_axes=(0,1,2), training=False)
        h = pallas_block(h)
        h = jax.nn.relu(h)
        h = temporal_shift(h, xpos, ypos, 1)
        h, _ = batch_norm(h, bn2_p, bn2_s, reduce_axes=(0,1,2), training=False)
        return jax.nn.relu(h + xx)
    case("tiny block combo", f_f, x)
if __name__ == "__main__":
    main()
