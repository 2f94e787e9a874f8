"""Probe 30: (a) jax.profiler trace of the train step, parsed for top ops;
(b) MAX_SHIFT tap-radius sweep (temporal conv is ~31% of the step now).

  nohup bash scratch/run_queue30.sh > scratch/queue30.log 2>&1 &
"""
import glob
import gzip
import json
import os
import subprocess
import sys
import time
import numpy as np


def run_model(max_shift=None, profile_dir=None, steps=10):
    """Run in a SUBPROCESS so SGT_MAX_SHIFT (read at import) takes effect."""
    env = dict(os.environ)
    if max_shift is not None:
        env["SGT_MAX_SHIFT"] = str(max_shift)
    code = f"""
import time, numpy as np, jax, jax.numpy as jnp
from shift_gcn_tpu.models.shift_gcn import ModelConfig, apply
from shift_gcn_tpu.train.optim import build_weight_decay_tree
from shift_gcn_tpu.train.state import create_train_state, make_train_step
rng = np.random.default_rng(0)
cfg = ModelConfig(num_class=2, num_point=33, num_person=1,
                  graph="mediapipe_pose", activation_dtype="bfloat16")
batch = {{"data": jnp.asarray(rng.standard_normal((64,3,300,33,1)), jnp.float32),
         "label": jnp.asarray(rng.integers(0,2,64), jnp.int32)}}
lr = jnp.asarray(0.1, jnp.float32)
state = create_train_state(jax.random.key(0), cfg)
wd = build_weight_decay_tree(state.params)
step = jax.jit(make_train_step(cfg, wd))
out = step(state, batch, lr)[1]["loss"]; jax.block_until_ready(out)
t0 = time.perf_counter()
for _ in range({steps}): out = step(state, batch, lr)[1]["loss"]
jax.block_until_ready(out)
dt = (time.perf_counter()-t0)/{steps}
print(f"train: {{64/dt:.1f}} clips/s ({{dt*1000:.1f}} ms)", flush=True)
fwd = jax.jit(lambda p, s, xx: apply(p, s, xx, cfg, training=False)[0])
out = fwd(state.params, state.bn_state, batch["data"]); jax.block_until_ready(out)
t0 = time.perf_counter()
for _ in range({steps}): out = fwd(state.params, state.bn_state, batch["data"])
jax.block_until_ready(out)
dt = (time.perf_counter()-t0)/{steps}
print(f"eval : {{64/dt:.1f}} clips/s ({{dt*1000:.1f}} ms)", flush=True)
prof = {profile_dir!r}
if prof:
    with jax.profiler.trace(prof):
        for _ in range(3):
            out = step(state, batch, lr)[1]["loss"]
        jax.block_until_ready(out)
    print("profile written", flush=True)
"""
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=1500)
    for line in r.stdout.splitlines():
        if "clips/s" in line or "profile" in line:
            print(f"  {line}", flush=True)
    if r.returncode != 0:
        print(f"  FAILED rc={r.returncode}: {r.stderr[-300:]}", flush=True)


def parse_trace(profile_dir):
    paths = glob.glob(os.path.join(
        profile_dir, "**", "*.trace.json.gz"), recursive=True)
    if not paths:
        print("no trace found", flush=True)
        return
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # sum durations on TPU device tracks by event name
    pid_names = {e.get("pid"): e.get("args", {}).get("name", "")
                 for e in events if e.get("name") == "process_name"}
    totals = {}
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = pid_names.get(e.get("pid"), "")
        if "TPU" not in str(pname) and "/device" not in str(pname):
            continue
        name = e.get("name", "?")
        totals[name] = totals.get(name, 0.0) + e.get("dur", 0)
    top = sorted(totals.items(), key=lambda kv: -kv[1])[:25]
    tot = sum(totals.values())
    print(f"device total {tot/1e3:.1f} ms over 3 steps; top ops:",
          flush=True)
    for name, dur in top:
        print(f"  {dur/1e3:8.2f} ms  {dur/tot*100:5.1f}%  {name[:100]}",
              flush=True)


def main():
    # NB: the parent must NOT touch the TPU — the chip is exclusive per
    # process and every model run below is a (serialized) subprocess.
    # Health gating is the queue runner's job.
    prof = "/tmp/sgt_profile"
    print("== baseline MAX_SHIFT=8 + profile ==", flush=True)
    run_model(max_shift=None, profile_dir=prof)
    parse_trace(prof)
    for ms in (4, 2):
        print(f"== MAX_SHIFT={ms} ==", flush=True)
        run_model(max_shift=ms)
    print("probe30 complete", flush=True)


if __name__ == "__main__":
    main()
