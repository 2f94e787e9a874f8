import sys; sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, numpy as np, traceback
from shift_gcn_tpu.ops.temporal_shift import temporal_shift
c = 3
x = jnp.zeros((1, 4, 2, c)); xpos = jnp.zeros(c); ypos = jnp.zeros(c)
def f(yp):
    return jnp.sum(temporal_shift(x, xpos, yp, 1))
try:
    gy = np.asarray(jax.grad(f)(ypos))
    print("tiny ok", gy)
except Exception as e:
    print("tiny FAIL", repr(e))
x2 = jnp.asarray(np.random.default_rng(1).standard_normal((2, 128, 33, 16)), jnp.float32)
xp2 = jnp.zeros(16); yp2 = jnp.zeros(16)
def f2(yp):
    return jnp.sum(temporal_shift(x2, xp2, yp, 1))
try:
    g2 = np.asarray(jax.grad(f2)(yp2))
    print("big ok", np.unique(np.round(np.abs(g2), 6)))
except Exception as e:
    print("big FAIL", repr(e))
    import jax as j
    with j.disable_jit():
        try:
            g2 = np.asarray(jax.grad(f2)(yp2))
            print("big nojit ok")
        except Exception as e2:
            traceback.print_exception(e2, chain=True)
