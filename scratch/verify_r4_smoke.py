import sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
print("devices:", jax.devices(), flush=True)
a = np.random.default_rng(0).standard_normal((128, 128)).astype(np.float32)
got = np.asarray(jnp.matmul(jnp.asarray(a), jnp.asarray(a), precision="highest"))
assert np.allclose(got, a @ a, atol=1e-2), "zombie worker"
print("healthcheck ok", flush=True)
import importlib
ts = importlib.import_module("shift_gcn_tpu.ops.temporal_shift")
x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 128, 33, 16)), jnp.float32)
xpos = jnp.zeros((16,), jnp.float32)
ypos = jnp.zeros((16,), jnp.float32)
def loss(ypos):
    return jnp.sum(ts.temporal_shift(x, xpos, ypos, 1))
g = jax.jit(jax.grad(loss))(ypos)
g.block_until_ready()
print("grad device:", list(g.devices())[0], flush=True)
mag = np.unique(np.round(np.abs(np.asarray(g)), 6))
print("|gy| values:", mag, flush=True)
assert np.all((mag == 0.01) | (mag == 0.0)), mag
print("TPU op smoke PASS", flush=True)
