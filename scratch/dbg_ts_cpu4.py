import sys; sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, numpy as np, traceback
from shift_gcn_tpu.ops.temporal_shift import temporal_shift
x2 = jnp.asarray(np.random.default_rng(1).standard_normal((2, 128, 33, 16)), jnp.float32)
xp2 = jnp.zeros(16); yp2 = jnp.zeros(16)
def f2(yp):
    return jnp.sum(temporal_shift(x2, xp2, yp, 1))
try:
    g2 = np.asarray(jax.jit(jax.grad(f2))(yp2))
    print("jit ok", np.unique(np.round(np.abs(g2), 6)))
except Exception as e:
    traceback.print_exception(e, chain=True)
