import sys
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, numpy as np, traceback
from shift_gcn_tpu.ops import temporal_shift as ts
x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 128, 33, 16)), jnp.float32)
xpos = jnp.zeros((16,), jnp.float32)
ypos = jnp.zeros((16,), jnp.float32)
def loss(yp):
    return jnp.sum(ts.temporal_shift(x, xpos, yp, 1))
try:
    g = jax.jit(jax.grad(loss))(ypos)
    print("ok", np.unique(np.round(np.abs(np.asarray(g)), 6)))
except Exception:
    traceback.print_exc(chain=True)
