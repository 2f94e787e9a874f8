"""Probe 2: (a) make_array_from_process_local_data with a seqpar-style
spec (data crossing processes, T sharded within); (b) np.asarray on a
fully-replicated multi-process array; (c) jit out_shardings=replicated."""
import os
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(os.environ["SGT_MH_PID"])
jax.distributed.initialize(os.environ["SGT_MH_COORD"], 2, pid)
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

devs = jax.devices()
mesh = Mesh(np.asarray(devs).reshape(2, 4), ("data", "model"))

# (a) local batch (2, 3, 8, 5): data axis crosses procs, dim2 sharded on model
rng = np.random.default_rng(42)
full = rng.standard_normal((4, 3, 8, 5)).astype(np.float32)
local = full[pid * 2:(pid + 1) * 2]
sh = NamedSharding(mesh, P("data", None, "model"))
try:
    arr = jax.make_array_from_process_local_data(sh, local, full.shape)
    print(f"[p{pid}] mafpld ok {arr.shape} {arr.sharding}", flush=True)
    # round-trip check via a replicated-output jit
    got = np.asarray(jax.jit(lambda a: a, out_shardings=NamedSharding(mesh, P()))(arr))
    print(f"[p{pid}] (a) roundtrip ok={np.allclose(got, full)}", flush=True)
except Exception as e:
    print(f"[p{pid}] mafpld FAILED: {type(e).__name__}: {e}", flush=True)

# (b)+(c): function with tuple output, single replicated out_shardings prefix
x = jax.device_put(full, NamedSharding(mesh, P("data")))
f = jax.jit(lambda a: (a * 2, jnp.sum(a)), out_shardings=NamedSharding(mesh, P()))
y, s = f(x)
print(f"[p{pid}] (b) fully_replicated={y.sharding.is_fully_replicated} "
      f"np_ok={np.allclose(np.asarray(y), full * 2)} s={float(s):.4f}", flush=True)
print(f"[p{pid}] PROBE2 PASS", flush=True)
