"""Probe 20a: standalone hardware parity of the reworked Pallas kernels.

- spatial fused_shift_gcn: shear via ONE tpu.dynamic_rotate (lane-strided
  sublane rotate) instead of the 6-step select loop
- temporal shift: scratch-ref loop with static in-bounds slices (zero tail)

Run standalone BEFORE the in-model groups: a kernel fault poisons the
worker for ~10 min and standalone parity tells us whether the rotate
lowering is supported at all.
"""
import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    a = np.random.default_rng(0).standard_normal((128, 128)).astype(np.float32)
    got = np.asarray(jnp.matmul(jnp.asarray(a), jnp.asarray(a),
                                precision="highest"))
    assert np.allclose(got, a @ a, atol=1e-2)
    print("health ok", flush=True)

    rng = np.random.default_rng(1)

    # --- spatial kernel vs XLA oracle ------------------------------------
    from shift_gcn_tpu.ops.pallas.shift_gcn_kernel import fused_shift_gcn
    from shift_gcn_tpu.ops.spatial_shift import spatial_shift

    for c, d in ((64, 64), (3, 64), (128, 256)):
        x = jnp.asarray(rng.standard_normal((512, 33, c)), jnp.float32)
        gate = jnp.asarray(rng.standard_normal((33, c)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((c, d)) * 0.1, jnp.float32)
        b = jnp.asarray(rng.standard_normal((d,)), jnp.float32)

        def oracle(x, gate, w, b):
            h = spatial_shift(x, 1) * gate
            z = jnp.einsum("rvc,cd->rvd", h, w,
                           precision="highest") + b
            return spatial_shift(z, -1)

        want = np.asarray(jax.jit(oracle)(x, gate, w, b))
        got = np.asarray(jax.jit(fused_shift_gcn)(x, gate, w, b))
        err = float(np.max(np.abs(got - want)))
        print(f"spatial fwd c={c} d={d}: max|diff|={err:.2e}", flush=True)
        assert err < 1e-3, "spatial fwd parity"

        def loss_p(args):
            return jnp.sum(fused_shift_gcn(*args) ** 2)

        def loss_o(args):
            return jnp.sum(oracle(*args) ** 2)

        gp = jax.jit(jax.grad(loss_p))((x, gate, w, b))
        go = jax.jit(jax.grad(loss_o))((x, gate, w, b))
        errs = [float(np.max(np.abs(np.asarray(a) - np.asarray(o))))
                for a, o in zip(gp, go)]
        rel = [e / (float(np.max(np.abs(np.asarray(o)))) + 1e-9)
               for e, o in zip(errs, go)]
        print(f"spatial bwd c={c} d={d}: rel errs={['%.1e' % e for e in rel]}",
              flush=True)
        assert max(rel) < 1e-3, "spatial bwd parity"

    # --- temporal kernel vs XLA lowering ---------------------------------
    from shift_gcn_tpu.ops.pallas.temporal_shift_kernel import (
        temporal_shift_pallas)
    from shift_gcn_tpu.ops.temporal_shift import temporal_shift

    for c, stride in ((64, 1), (64, 2), (256, 1), (256, 2)):
        x = jnp.asarray(rng.standard_normal((4, 300, 33, c)), jnp.float32)
        xpos = jnp.zeros((c,), jnp.float32)
        ypos = jnp.asarray(rng.uniform(-1, 1, c), jnp.float32)
        want = np.asarray(jax.jit(
            lambda x, xp, yp: temporal_shift(x, xp, yp, stride))(
                x, xpos, ypos))
        got = np.asarray(jax.jit(
            lambda x, xp, yp: temporal_shift_pallas(x, xp, yp, stride))(
                x, xpos, ypos))
        err = float(np.max(np.abs(got - want)))
        print(f"temporal fwd c={c} s={stride}: max|diff|={err:.2e}",
              flush=True)
        assert err < 1e-5, "temporal fwd parity"

        def lp(args):
            return jnp.sum(temporal_shift_pallas(*args, stride) ** 2)

        def lo(args):
            return jnp.sum(temporal_shift(*args, stride) ** 2)

        gp = jax.jit(jax.grad(lp))((x, xpos, ypos))
        go = jax.jit(jax.grad(lo))((x, xpos, ypos))
        errs = [float(np.max(np.abs(np.asarray(a) - np.asarray(o))))
                for a, o in zip(gp, go)]
        print(f"temporal bwd c={c} s={stride}: "
              f"errs={['%.1e' % e for e in errs]}", flush=True)
        assert max(errs) < 1e-4, "temporal bwd parity"

    print("probe20 standalone complete", flush=True)


if __name__ == "__main__":
    main()
