"""Probe 5: which Trainer wrinkle hangs the TP step? (a) donate_argnums,
(b) device_put on a worker thread, (c) bf16 transfer + restore wrapper."""
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
state = create_train_state(jax.random.key(1), config)
wd = build_weight_decay_tree(state.params)
state = jax.device_put(state, mesh_lib.state_shardings(mesh, state))
rng = np.random.default_rng(0)
bh = {"data": rng.standard_normal((4, 3, 16, 25, 1)).astype(np.float32),
      "label": rng.integers(0, 2, 4).astype(np.int32)}
lr = jnp.asarray(0.1, jnp.float32)

# (b) device_put on a worker thread
log("(b) threaded device_put")
with ThreadPoolExecutor(max_workers=1) as pool:
    fut = pool.submit(mesh_lib.shard_batch, mesh, bh, None, replicated_batch=True)
    batch = fut.result(timeout=60)
log("(b) ok")

# (a) donated step
log("(a) donated step compile+run")
step_d = jax.jit(make_train_step(config, wd), donate_argnums=(0,))
state2, metrics = step_d(state, batch, lr)
jax.block_until_ready(metrics)
log(f"(a) ok loss={float(metrics['loss']):.4f}")

# (c) bf16 transfer wrapper
log("(c) bf16 transfer + restore")
from shift_gcn_tpu.train.transfer import restore_batch_fp32
bh16 = {"data": bh["data"].astype(jnp.bfloat16), "label": bh["label"]}
with ThreadPoolExecutor(max_workers=1) as pool:
    batch16 = pool.submit(mesh_lib.shard_batch, mesh, bh16, None, replicated_batch=True).result(timeout=60)
inner = make_train_step(config, wd)
step_c = jax.jit(lambda s, b, l: inner(s, restore_batch_fp32(b), l), donate_argnums=(0,))
state3, metrics = step_c(state2, batch16, lr)
jax.block_until_ready(metrics)
log(f"(c) ok loss={float(metrics['loss']):.4f}")

# loop like the trainer: prefetch thread + repeated steps
log("(d) pipelined 8-step loop")
with ThreadPoolExecutor(max_workers=1) as pool:
    pending = pool.submit(mesh_lib.shard_batch, mesh, bh16, None, replicated_batch=True)
    st = state3
    for i in range(8):
        b = pending.result(timeout=60)
        pending = pool.submit(mesh_lib.shard_batch, mesh, bh16, None, replicated_batch=True)
        st, metrics = step_c(st, b, lr)
    jax.block_until_ready(metrics)
log("(d) ok")
log("PROBE5 PASS")
