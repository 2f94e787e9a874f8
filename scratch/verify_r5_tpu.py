import time
import jax, jax.numpy as jnp
import numpy as np

t0 = time.time()
dev = jax.devices()[0]
print("device:", dev, flush=True)

# healthcheck matmul at pinned precision (platform bf16 default gotcha)
a = jnp.asarray(np.random.default_rng(0).standard_normal((128, 128)), jnp.float32)
mm = jax.jit(lambda x: jnp.dot(x, x, precision="highest"))
got = np.asarray(mm(a))
want = np.asarray(a) @ np.asarray(a)
print("healthcheck matmul max|diff|:", float(np.max(np.abs(got - want))), flush=True)

from shift_gcn_tpu.ops.temporal_shift import temporal_shift
x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 160, 25, 8)), jnp.float32)
xpos = jnp.zeros(8); ypos = jnp.asarray(np.linspace(-2, 2, 8), jnp.float32)

def loss(xx, xp, yp):
    return jnp.sum(temporal_shift(xx, xp, yp, 1) ** 2)
g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
gx, gxp, gyp = g(x, xpos, ypos)
print("out device:", list(gx.devices())[0], flush=True)
print("|gy| values:", sorted(set(np.round(np.abs(np.asarray(gyp)), 6).tolist())), flush=True)
assert all(abs(abs(v) - 0.01) < 1e-9 or abs(v - 1e-4) < 1e-9 for v in np.asarray(gyp).tolist()) or \
       np.allclose(np.abs(np.asarray(gyp)), 0.01), np.asarray(gyp)
print("TPU smoke OK in %.1fs" % (time.time() - t0), flush=True)
