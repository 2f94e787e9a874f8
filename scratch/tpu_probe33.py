"""Probe 33: retry dft-temporal (handwritten bwd) with long compile budget,
eval graph first, then the train step; conv recheck last.

  nohup bash scratch/run_queue33.sh > scratch/queue33.log 2>&1 &
"""
import os
import subprocess
import sys

EVAL_CODE = """
import time, numpy as np, jax, jax.numpy as jnp
from shift_gcn_tpu.models.shift_gcn import ModelConfig, apply
rng = np.random.default_rng(0)
cfg = ModelConfig(num_class=2, num_point=33, num_person=1,
                  graph="mediapipe_pose", activation_dtype="bfloat16")
x = jnp.asarray(rng.standard_normal((64,3,300,33,1)), jnp.float32)
from shift_gcn_tpu.train.state import create_train_state
state = create_train_state(jax.random.key(0), cfg)
fwd = jax.jit(lambda p, s, xx: apply(p, s, xx, cfg, training=False)[0])
t0 = time.perf_counter()
out = fwd(state.params, state.bn_state, x); jax.block_until_ready(out)
print(f"eval compile+run: {time.perf_counter()-t0:.1f} s", flush=True)
t0 = time.perf_counter()
for _ in range(10): out = fwd(state.params, state.bn_state, x)
jax.block_until_ready(out)
dt = (time.perf_counter()-t0)/10
print(f"eval : {64/dt:.1f} clips/s ({dt*1000:.1f} ms)", flush=True)
"""

TRAIN_CODE = """
import time, numpy as np, jax, jax.numpy as jnp
from shift_gcn_tpu.models.shift_gcn import ModelConfig
from shift_gcn_tpu.train.optim import build_weight_decay_tree
from shift_gcn_tpu.train.state import create_train_state, make_train_step
rng = np.random.default_rng(0)
cfg = ModelConfig(num_class=2, num_point=33, num_person=1,
                  graph="mediapipe_pose", activation_dtype="bfloat16")
batch = {"data": jnp.asarray(rng.standard_normal((64,3,300,33,1)), jnp.float32),
         "label": jnp.asarray(rng.integers(0,2,64), jnp.int32)}
lr = jnp.asarray(0.1, jnp.float32)
state = create_train_state(jax.random.key(0), cfg)
wd = build_weight_decay_tree(state.params)
step = jax.jit(make_train_step(cfg, wd))
t0 = time.perf_counter()
out = step(state, batch, lr)[1]["loss"]; jax.block_until_ready(out)
print(f"train compile+run: {time.perf_counter()-t0:.1f} s loss={float(out):.4f}",
      flush=True)
t0 = time.perf_counter()
for _ in range(10): out = step(state, batch, lr)[1]["loss"]
jax.block_until_ready(out)
dt = (time.perf_counter()-t0)/10
print(f"train: {64/dt:.1f} clips/s ({dt*1000:.1f} ms)", flush=True)
"""


def run(name, code, env_extra=None, timeout=3600):
    env = dict(os.environ)
    if env_extra:
        env.update(env_extra)
    print(f"== {name} ==", flush=True)
    try:
        r = subprocess.run([sys.executable, "-c", code], env=env,
                           capture_output=True, text=True, timeout=timeout)
    except subprocess.TimeoutExpired:
        print(f"  TIMEOUT after {timeout}s", flush=True)
        return 124
    for line in r.stdout.splitlines():
        print(f"  {line}", flush=True)
    if r.returncode != 0:
        print(f"  FAILED rc={r.returncode}: {r.stderr[-500:]}", flush=True)
    return r.returncode


def main():
    dft = {"SGT_TSHIFT_IMPL": "dft"}
    if run("dft eval", EVAL_CODE, dft) == 0:
        run("dft train", TRAIN_CODE, dft)
    run("conv train recheck", TRAIN_CODE)
    print("probe33 complete", flush=True)


if __name__ == "__main__":
    main()
