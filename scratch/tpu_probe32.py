"""Probe 32: dft temporal lowering with the handwritten backward
(spectrum reuse + Parseval constraint grad) vs conv baseline; plus the
fixed op-level smoke from probe31.

  nohup bash scratch/run_queue32.sh > scratch/queue32.log 2>&1 &
"""
import os
import subprocess
import sys

MODEL_CODE = """
import time, numpy as np, jax, jax.numpy as jnp
from shift_gcn_tpu.models.shift_gcn import ModelConfig, apply
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
out = step(state, batch, lr)[1]["loss"]; jax.block_until_ready(out)
t0 = time.perf_counter()
for _ in range(10): out = step(state, batch, lr)[1]["loss"]
jax.block_until_ready(out)
dt = (time.perf_counter()-t0)/10
print(f"train: {64/dt:.1f} clips/s ({dt*1000:.1f} ms)", flush=True)
fwd = jax.jit(lambda p, s, xx: apply(p, s, xx, cfg, training=False)[0])
out = fwd(state.params, state.bn_state, batch["data"]); jax.block_until_ready(out)
t0 = time.perf_counter()
for _ in range(10): out = fwd(state.params, state.bn_state, batch["data"])
jax.block_until_ready(out)
dt = (time.perf_counter()-t0)/10
print(f"eval : {64/dt:.1f} clips/s ({dt*1000:.1f} ms)", flush=True)
"""

OP_SMOKE = """
import os, numpy as np, jax, jax.numpy as jnp
import importlib
ts = importlib.import_module("shift_gcn_tpu.ops.temporal_shift")
dev = jax.devices()[0]
print("device:", dev.platform, dev.device_kind, flush=True)
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((4, 128, 33, 64)), jnp.float32)
xpos = jnp.zeros((64,), jnp.float32)
ypos = jnp.asarray(rng.uniform(-2, 2, 64), jnp.float32)
outs = {}
for impl in ("conv", "dft"):
    os.environ["SGT_TSHIFT_IMPL"] = impl
    f = jax.jit(lambda xx, _i=impl: ts.temporal_shift(xx, xpos, ypos, 1))
    outs[impl] = np.asarray(f(x))
    g = jax.grad(lambda yp, _i=impl: jnp.sum(
        ts.temporal_shift(x, xpos, yp, 1)))(ypos)
    g = np.asarray(g)
    assert np.allclose(np.abs(g), 0.01, atol=1e-8), (impl, g[:4])
    print(f"{impl}: out[0,0,0,:3]={outs[impl][0,0,0,:3]} |gy|==0.01 ok",
          flush=True)
err = np.max(np.abs(outs["conv"] - outs["dft"]))
print(f"conv-vs-dft max abs err on TPU: {err:.2e}", flush=True)
assert err < 5e-4, err
print("op smoke OK", flush=True)
"""


def run(name, code, env_extra=None, timeout=1800):
    env = dict(os.environ)
    if env_extra:
        env.update(env_extra)
    print(f"== {name} ==", flush=True)
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=timeout)
    for line in r.stdout.splitlines():
        print(f"  {line}", flush=True)
    if r.returncode != 0:
        print(f"  FAILED rc={r.returncode}: {r.stderr[-500:]}", flush=True)
    return r.returncode


def main():
    run("op smoke (conv vs dft on TPU)", OP_SMOKE)
    run("model dft temporal (handwritten bwd)", MODEL_CODE,
        {"SGT_TSHIFT_IMPL": "dft"})
    run("model conv baseline (recheck)", MODEL_CODE)
    print("probe32 complete", flush=True)


if __name__ == "__main__":
    main()
