"""TPU hardware smoke for the matmul temporal-shift lowering.

Checks: runs on the real TPU device, matches the conv lowering bit-for-bit
(fp32 tolerance), and the constraint backward still yields |gy| == 0.01.
"""
import os

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    # pin fp32 contractions so the conv-vs-matmul comparison is exact
    # (the platform's default matmul precision is bf16)
    jax.config.update("jax_default_matmul_precision", "highest")
    print("devices:", jax.devices(), flush=True)
    a = np.random.default_rng(0).standard_normal((128, 128)).astype(np.float32)
    got = np.asarray(jnp.matmul(jnp.asarray(a), jnp.asarray(a),
                                precision="highest"))
    assert np.allclose(got, a @ a, atol=1e-2), "worker zombie: bad numerics"
    print("health ok", flush=True)

    from shift_gcn_tpu.ops import temporal_shift

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((4, 160, 33, 64)), jnp.float32)
    xpos = jnp.zeros(64, jnp.float32)
    ypos = jnp.asarray(rng.uniform(-1.5, 1.5, 64), jnp.float32)
    g = jnp.asarray(rng.standard_normal((4, 160, 33, 64)), jnp.float32)

    outs = {}
    for impl in ("conv", "matmul"):
        os.environ["SGT_TSHIFT_IMPL"] = impl

        @jax.jit
        def f(x, xpos, ypos, g):
            out = temporal_shift(x, xpos, ypos, 1)
            loss = jnp.sum(out * g)
            gy = jax.grad(
                lambda yp: jnp.sum(temporal_shift(x, xpos, yp, 1) * g))(ypos)
            return out, loss, gy

        out, loss, gy = f(x, xpos, ypos, g)
        jax.block_until_ready(out)
        dev = list(out.devices())[0]
        print(f"{impl}: device={dev} loss={float(loss):.4f} "
              f"|gy| uniq={np.unique(np.abs(np.asarray(gy)))}", flush=True)
        assert "TPU" in str(dev) or "tpu" in str(dev.platform), dev
        np.testing.assert_allclose(
            np.abs(np.asarray(gy)), 0.01, atol=1e-9)
        outs[impl] = np.asarray(out)

    np.testing.assert_allclose(outs["matmul"], outs["conv"],
                               atol=1e-4, rtol=1e-4)
    print("TPU SMOKE OK: matmul == conv on hardware, constraint bwd exact",
          flush=True)


if __name__ == "__main__":
    main()
