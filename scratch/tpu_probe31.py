"""Probe 31: verify pass + frequency-domain TEMPORAL shift measurement.

Steps (each model run in its own subprocess; the parent never touches TPU):
  1. op-level TPU smoke: temporal_shift fwd on TPU device, constraint
     backward |gy| == 0.01, dft-vs-conv lowering agreement on-device.
  2. in-model train/eval clips/s: conv baseline vs SGT_TSHIFT_IMPL=dft.
  3. BN micro-probe: per-formulation timing of the train-mode batch_norm
     stack at real block shapes.

  nohup bash scratch/run_queue31.sh > scratch/queue31.log 2>&1 &
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
import numpy as np, jax, jax.numpy as jnp
from shift_gcn_tpu.ops import temporal_shift as ts
dev = jax.devices()[0]
print("device:", dev.platform, dev.device_kind, flush=True)
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((4, 128, 33, 64)), jnp.float32)
xpos = jnp.zeros((64,), jnp.float32)
ypos = jnp.asarray(rng.uniform(-2, 2, 64), jnp.float32)
import shift_gcn_tpu.ops.temporal_shift as m
import os
outs = {}
for impl in ("conv", "dft"):
    os.environ["SGT_TSHIFT_IMPL"] = impl
    f = jax.jit(lambda xx: ts.temporal_shift(xx, xpos, ypos, 1))
    outs[impl] = np.asarray(f(x))
    g = jax.grad(lambda yp: jnp.sum(ts.temporal_shift(x, xpos, yp, 1)))(ypos)
    g = np.asarray(g)
    assert np.allclose(np.abs(g), 0.01, atol=1e-8), (impl, g[:4])
    print(f"{impl}: out[0,0,0,:3]={outs[impl][0,0,0,:3]} |gy|==0.01 ok",
          flush=True)
err = np.max(np.abs(outs["conv"] - outs["dft"]))
print(f"conv-vs-dft max abs err on TPU: {err:.2e}", flush=True)
assert err < 5e-4, err
print("op smoke OK", flush=True)
"""

BN_PROBE = """
import time, numpy as np, jax, jax.numpy as jnp
from shift_gcn_tpu.ops.batchnorm import batch_norm, init_bn

def timeit(f, *a, n=20):
    o = f(*a); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(n): o = f(*a)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / n * 1000

rng = np.random.default_rng(0)
# shift_gcn BN shape: rows = N*T, features = V*C (l1-l4 scale)
for (r, feat) in ((19200, 33*64), (9600, 33*128), (4800, 33*256)):
    x = jnp.asarray(rng.standard_normal((r, feat)), jnp.bfloat16)
    p, s = init_bn(feat)
    f_cur = jax.jit(lambda xx: batch_norm(
        xx, p, s, reduce_axes=(0,), training=True)[0])
    # variant: stats + normalize entirely in bf16 (fp32 accum via psum dot)
    def bn_bf16(xx):
        mean = jnp.mean(xx.astype(jnp.float32), axis=0)
        var = jnp.mean(jnp.square(xx.astype(jnp.float32)), axis=0) - mean**2
        inv = jax.lax.rsqrt(var + 1e-5)
        a = (p["weight"] * inv).astype(xx.dtype)
        b = (p["bias"] - mean * p["weight"] * inv).astype(xx.dtype)
        return xx * a + b
    f_aff = jax.jit(bn_bf16)
    # variant: stats via MXU (ones-vector matmul reduce)
    def bn_mxu(xx):
        ones = jnp.ones((1, xx.shape[0]), jnp.bfloat16)
        stk = jnp.concatenate([xx[None], jnp.square(xx)[None]], 0)
        mom = jnp.einsum("on,knf->kof", ones, stk,
                         preferred_element_type=jnp.float32)[:, 0] / xx.shape[0]
        mean, msq = mom[0], mom[1]
        var = msq - mean**2
        inv = jax.lax.rsqrt(var + 1e-5)
        a = (p["weight"] * inv).astype(xx.dtype)
        b = (p["bias"] - mean * p["weight"] * inv).astype(xx.dtype)
        return xx * a + b
    f_mxu = jax.jit(bn_mxu)
    print(f"({r},{feat}): current {timeit(f_cur, x):.2f} ms | "
          f"affine-bf16 {timeit(f_aff, x):.2f} ms | "
          f"mxu-stats {timeit(f_mxu, x):.2f} ms", flush=True)
print("bn probe done", flush=True)
"""


def run(name, code, env_extra=None, timeout=1500):
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
    run("model conv baseline", MODEL_CODE)
    run("model dft temporal", MODEL_CODE, {"SGT_TSHIFT_IMPL": "dft"})
    run("bn micro-probe", BN_PROBE)
    print("probe31 complete", flush=True)


if __name__ == "__main__":
    main()
