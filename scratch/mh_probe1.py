"""Probe: can jax+gloo on CPU shard a param axis ACROSS 2 processes?
Child of mh_probe1_driver (run directly with SGT_MH_PID/COORD set)."""
import os, sys
import numpy as np

import jax
jax.config.update("jax_platforms", "cpu")
pid = int(os.environ["SGT_MH_PID"])
jax.distributed.initialize(os.environ["SGT_MH_COORD"], 2, pid)
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

devs = jax.devices()
print(f"[p{pid}] procs={jax.process_count()} global={len(devs)} local={len(jax.local_devices())}", flush=True)

# mesh (1,8): 'model' axis spans BOTH processes
mesh = Mesh(np.asarray(devs).reshape(1, 8), ("data", "model"))
rng = np.random.default_rng(0)
w_host = rng.standard_normal((16, 32)).astype(np.float32)   # shard cols over model
x_host = rng.standard_normal((8, 16)).astype(np.float32)    # replicated batch

w_sh = NamedSharding(mesh, P(None, "model"))
x_sh = NamedSharding(mesh, P("data"))

def put(a, sh):
    try:
        return jax.device_put(a, sh), "device_put"
    except Exception as e:
        print(f"[p{pid}] device_put failed: {type(e).__name__}: {e}", flush=True)
        return jax.make_array_from_callback(a.shape, sh, lambda idx: a[idx]), "callback"

w, how_w = put(w_host, w_sh)
x, how_x = put(x_host, x_sh)
print(f"[p{pid}] put w via {how_w}, x via {how_x}", flush=True)

@jax.jit
def f(xx, ww):
    y = xx @ ww          # output cols sharded over model
    return jnp.sum(y * y)  # forces a cross-process reduce

got = float(f(x, w))
want = float(np.sum((x_host @ w_host) ** 2))
print(f"[p{pid}] got={got:.6f} want={want:.6f} ok={abs(got-want) < 1e-2 * abs(want)}", flush=True)

# grad wrt sharded w (the TP training pattern)
g = jax.jit(jax.grad(lambda ww, xx: f(xx, ww)))(w, x)
gw = np.asarray(jax.experimental.multihost_utils.process_allgather(g, tiled=True))
print(f"[p{pid}] grad ok shape={gw.shape}", flush=True)

# shard_map with ppermute across the process-spanning axis
from functools import partial
def shift_fn(b):
    i = jax.lax.axis_index("model")
    sz = jax.lax.axis_size("model")
    return jax.lax.ppermute(b, "model", [(j, (j + 1) % sz) for j in range(sz)])
big = np.arange(32, dtype=np.float32).reshape(8, 4)
bigd = jax.device_put(big, NamedSharding(mesh, P("model")))
out = jax.jit(jax.shard_map(shift_fn, mesh=mesh, in_specs=P("model"), out_specs=P("model")))(bigd)
outg = np.asarray(jax.experimental.multihost_utils.process_allgather(out, tiled=True))
want_roll = np.roll(big, 1, axis=0)
print(f"[p{pid}] ppermute-across-procs ok={np.allclose(outg, want_roll)}", flush=True)
print(f"[p{pid}] PROBE1 PASS", flush=True)
