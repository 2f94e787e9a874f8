"""Probe 4: pinpoint which Pallas kernel/shape fails to compile."""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    print("health:", float((jnp.ones((8, 8)) @ jnp.ones((8, 8))).sum()),
          flush=True)

    import shift_gcn_tpu.ops.pallas.shift_gcn_kernel as pk

    rng = np.random.default_rng(0)

    def try_case(name, fn):
        try:
            out = fn()
            jax.block_until_ready(out)
            print(f"{name}: OK", flush=True)
            return True
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__} {str(e)[:150]}",
                  flush=True)
            return False

    def fwd_case(r, v, c, d):
        x = jnp.asarray(rng.standard_normal((r, v, c)), jnp.float32)
        gate = jnp.ones((v, c), jnp.float32)
        w = jnp.asarray(rng.standard_normal((c, d)), jnp.float32)
        b = jnp.zeros((d,), jnp.float32)
        return lambda: pk.fused_shift_gcn(x, gate, w, b, 256)

    def dx_case(r, v, c, d):
        g = jnp.asarray(rng.standard_normal((r, v, d)), jnp.float32)
        gate = jnp.ones((1, v, c), jnp.float32)
        w = jnp.asarray(rng.standard_normal((c, d)), jnp.float32)
        return lambda: pk._run_dx(g, gate, w, 256)

    def sg_case(r, v, c):
        x = jnp.asarray(rng.standard_normal((r, v, c)), jnp.float32)
        gate = jnp.ones((1, v, c), jnp.float32)
        return lambda: pk._run_shear_gate(x, gate, 256)

    try_case("fwd v33 c3 d64", fwd_case(512, 33, 3, 64))
    try_case("fwd v33 c64 d64", fwd_case(512, 33, 64, 64))
    try_case("dx  v33 c64 d64", dx_case(512, 33, 64, 64))
    try_case("dx  v33 c3 d64", dx_case(512, 33, 3, 64))
    try_case("sg  v33 c64", sg_case(512, 33, 64))
    try_case("sg  v33 c3", sg_case(512, 33, 3))

    # full grad through one fused op
    def grad_case(c, d):
        x = jnp.asarray(rng.standard_normal((512, 33, c)), jnp.float32)
        gate = jnp.ones((33, c), jnp.float32)
        w = jnp.asarray(rng.standard_normal((c, d)), jnp.float32)
        b = jnp.zeros((d,), jnp.float32)

        def loss(x_, gate_, w_, b_):
            return jnp.sum(pk.fused_shift_gcn(x_, gate_, w_, b_, 256))

        return lambda: jax.grad(loss, argnums=(0, 1, 2, 3))(x, gate, w, b)

    try_case("grad c64 d64", grad_case(64, 64))
    try_case("grad c3 d64", grad_case(3, 64))
    try_case("grad c128 d256", grad_case(128, 256))


if __name__ == "__main__":
    main()
