"""Probe 6: bisect the pipelined-loop hang: donation x prefetch-thread."""
import os, time
from concurrent.futures import ThreadPoolExecutor
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(os.environ["SGT_MH_PID"])
jax.distributed.initialize(os.environ["SGT_MH_COORD"], 2, pid)
import jax.numpy as jnp

def log(m): print(f"[p{pid} {time.strftime('%H:%M:%S')}] {m}", flush=True)

from shift_gcn_tpu.models.shift_gcn import BlockSpec, ModelConfig
from shift_gcn_tpu.train.optim import build_weight_decay_tree
from shift_gcn_tpu.train.state import create_train_state, make_train_step
from shift_gcn_tpu.parallel import mesh as mesh_lib

config = ModelConfig(num_class=2, num_point=25, num_person=1, graph="ntu_rgb_d",
                     blocks=(BlockSpec(3, 8, residual=False), BlockSpec(8, 16, stride=2)))
mesh = mesh_lib.make_mesh([1, 8])
state0 = create_train_state(jax.random.key(1), config)
wd = build_weight_decay_tree(state0.params)
state0 = jax.device_put(state0, mesh_lib.state_shardings(mesh, state0))
rng = np.random.default_rng(0)
bh = {"data": rng.standard_normal((4, 3, 16, 25, 1)).astype(np.float32),
      "label": rng.integers(0, 2, 4).astype(np.int32)}
lr = jnp.asarray(0.1, jnp.float32)
put = lambda: mesh_lib.shard_batch(mesh, bh, None, replicated_batch=True)
step_plain = jax.jit(make_train_step(config, wd))
step_don = jax.jit(make_train_step(config, wd), donate_argnums=(0,))

log("(1) main-thread puts, NO donation, 6 steps")
st = state0
for i in range(6):
    st, m = step_plain(st, put(), lr)
jax.block_until_ready(m); log("(1) ok")

log("(2) main-thread puts, donation, 6 steps")
st = jax.device_put(state0, mesh_lib.state_shardings(mesh, state0))
for i in range(6):
    st, m = step_don(st, put(), lr)
    log(f"  (2) step {i} dispatched")
jax.block_until_ready(m); log("(2) ok")

log("(3) prefetch-thread puts, NO donation, 6 steps")
st = state0
with ThreadPoolExecutor(max_workers=1) as pool:
    pending = pool.submit(put)
    for i in range(6):
        b = pending.result(timeout=60)
        pending = pool.submit(put)
        st, m = step_plain(st, b, lr)
jax.block_until_ready(m); log("(3) ok")
log("PROBE6 PASS")
