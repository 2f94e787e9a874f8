"""Verify step 1: real-TPU smoke — op + model forward on device, constraint
backward magnitudes, dft-default spatial path."""
import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    a = np.random.default_rng(0).standard_normal((128, 128)).astype(np.float32)
    got = np.asarray(jnp.matmul(jnp.asarray(a), jnp.asarray(a),
                                precision="highest"))
    assert np.allclose(got, a @ a, atol=1e-2)
    print("health ok; device:", jax.devices()[0], flush=True)

    from shift_gcn_tpu.ops.temporal_shift import temporal_shift

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 128, 5, 8)), jnp.float32)
    xpos = jnp.zeros((8,))
    ypos = jnp.asarray(rng.uniform(-1, 1, 8), jnp.float32)

    def loss(xx, xp, yp):
        return jnp.sum(temporal_shift(xx, xp, yp, 1) ** 2)

    gx, gxp, gyp = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(x, xpos, ypos)
    gyp = np.asarray(gyp)
    print("op grad device:", gx.device, flush=True)
    assert np.allclose(np.abs(gyp), 0.01, atol=1e-6), gyp
    assert np.allclose(np.asarray(gxp), 0.0), gxp
    print("constraint backward: |gy| == 0.01, gx == 0  OK", flush=True)

    from shift_gcn_tpu.models.shift_gcn import ModelConfig, apply, init_params

    cfg = ModelConfig(num_class=2, num_point=33, num_person=1,
                      graph="mediapipe_pose", activation_dtype="bfloat16")
    params, state = init_params(jax.random.key(0), cfg)
    xb = jnp.asarray(rng.standard_normal((4, 3, 300, 33, 1)), jnp.float32)
    logits, _ = jax.jit(
        lambda p, s, xx: apply(p, s, xx, cfg, training=False))(
            params, state, xb)
    logits = np.asarray(logits)
    print("model fwd (dft default, bf16 act):", logits.shape,
          logits[0], flush=True)
    assert logits.shape == (4, 2) and np.isfinite(logits).all()
    print("verify tpu smoke complete", flush=True)


if __name__ == "__main__":
    main()
