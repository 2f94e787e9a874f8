"""Probe 4: bisect the TP train-step hang — direct step call, no Trainer."""
import os, time
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(os.environ["SGT_MH_PID"])
jax.distributed.initialize(os.environ["SGT_MH_COORD"], 2, pid)
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

def log(m): print(f"[p{pid} {time.strftime('%H:%M:%S')}] {m}", flush=True)

from shift_gcn_tpu.models.shift_gcn import BlockSpec, ModelConfig
from shift_gcn_tpu.train.optim import build_weight_decay_tree
from shift_gcn_tpu.train.state import create_train_state, make_train_step
from shift_gcn_tpu.parallel import mesh as mesh_lib

config = ModelConfig(num_class=2, num_point=25, num_person=1, graph="ntu_rgb_d",
                     blocks=(BlockSpec(3, 8, residual=False), BlockSpec(8, 16, stride=2)))
mesh = mesh_lib.make_mesh([1, 8])
log("init state")
state = create_train_state(jax.random.key(1), config)
wd = build_weight_decay_tree(state.params)
log("commit state to TP shardings")
state = jax.device_put(state, mesh_lib.state_shardings(mesh, state))
log("state committed")
rng = np.random.default_rng(0)
batch_host = {"data": rng.standard_normal((4, 3, 16, 25, 1)).astype(np.float32),
              "label": rng.integers(0, 2, 4).astype(np.int32)}
batch = mesh_lib.shard_batch(mesh, batch_host, replicated_batch=True)
log("batch placed")
step = jax.jit(make_train_step(config, wd))
log("lowering...")
lowered = step.lower(state, batch, jnp.asarray(0.1, jnp.float32))
log("compiling...")
compiled = lowered.compile()
log("compiled; executing...")
state2, metrics = compiled(state, batch, jnp.asarray(0.1, jnp.float32))
jax.block_until_ready(metrics)
log(f"loss={float(metrics['loss']):.4f}")
log("PROBE4 PASS")
