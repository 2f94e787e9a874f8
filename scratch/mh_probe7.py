"""Probe 7: replicated-batch transfer via make_array_from_process_local_data
(global_shape == local shape) on a prefetch thread, repeated steps."""
import os, time
from concurrent.futures import ThreadPoolExecutor
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(os.environ["SGT_MH_PID"])
jax.distributed.initialize(os.environ["SGT_MH_COORD"], 2, pid)
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

def log(m): print(f"[p{pid} {time.strftime('%H:%M:%S')}] {m}", flush=True)

from shift_gcn_tpu.models.shift_gcn import BlockSpec, ModelConfig
from shift_gcn_tpu.train.optim import build_weight_decay_tree
from shift_gcn_tpu.train.state import create_train_state, make_train_step
from shift_gcn_tpu.parallel import mesh as mesh_lib

config = ModelConfig(num_class=2, num_point=25, num_person=1, graph="ntu_rgb_d",
                     blocks=(BlockSpec(3, 8, residual=False), BlockSpec(8, 16, stride=2)))
mesh = mesh_lib.make_mesh([1, 8])
state = create_train_state(jax.random.key(1), config)
wd = build_weight_decay_tree(state.params)
state = jax.device_put(state, mesh_lib.state_shardings(mesh, state))
rng = np.random.default_rng(0)
bh = {"data": rng.standard_normal((4, 3, 16, 25, 1)).astype(np.float32),
      "label": rng.integers(0, 2, 4).astype(np.int32)}
lr = jnp.asarray(0.1, jnp.float32)
default = NamedSharding(mesh, P("data"))

def put():
    return jax.tree_util.tree_map(
        lambda a: jax.make_array_from_process_local_data(default, np.asarray(a), a.shape), bh)

step = jax.jit(make_train_step(config, wd), donate_argnums=(0,))
log("first put (check values round-trip)")
b0 = put()
got = np.asarray(jax.jit(lambda b: b["data"], out_shardings=NamedSharding(mesh, P()))(b0))
log(f"roundtrip ok={np.allclose(got, bh['data'])}")
log("pipelined 10-step loop, prefetch thread + donation")
with ThreadPoolExecutor(max_workers=1) as pool:
    pending = pool.submit(put)
    for i in range(10):
        b = pending.result(timeout=60)
        pending = pool.submit(put)
        state, m = step(state, b, lr)
    jax.block_until_ready(m)
log(f"loop ok loss={float(m['loss']):.4f}")
log("PROBE7 PASS")
