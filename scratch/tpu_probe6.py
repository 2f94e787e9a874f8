import numpy as np
def main():
    import jax, jax.numpy as jnp
    print("health:", float((jnp.ones((8,8))@jnp.ones((8,8))).sum()), flush=True)
    import shift_gcn_tpu.ops.pallas.shift_gcn_kernel as pk
    rng = np.random.default_rng(0)
    for (c, d) in ((64,128),(128,128),(128,256),(256,256)):
        x = jnp.asarray(rng.standard_normal((512,33,c)), jnp.float32)
        gate = jnp.ones((33,c), jnp.float32)
        w = jnp.asarray(rng.standard_normal((c,d)), jnp.float32)
        b = jnp.zeros((d,), jnp.float32)
        try:
            out = pk.fused_shift_gcn(x, gate, w, b)
            jax.block_until_ready(out)
            print(f"fwd c{c} d{d} rb={pk.pick_row_block(33,c,d)}: OK", flush=True)
        except Exception as e:
            print(f"fwd c{c} d{d} rb={pk.pick_row_block(33,c,d)}: FAILED {str(e)[:90]}", flush=True)
if __name__ == "__main__":
    main()
