"""Probe: jax.profiler trace of the default train step + top-op table.

Captures a device trace of a few steps of the shipped configuration and
aggregates the Chrome-trace events by HLO/op name, printing the top ops
by total duration — the evidence layer under the coarse
ablate-to-identity numbers in docs/PERF.md (which say: spatial ~59 ms,
temporal ~48 ms, BN ~26 ms of the 156 ms step).

Run detached: nohup python scratch/probe_profile.py > scratch/profile_r2.log 2>&1 &
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

TRACE_DIR = "/tmp/sgt_profile"


def run_steps():
    from shift_gcn_tpu.models.shift_gcn import ModelConfig
    from shift_gcn_tpu.train.optim import build_weight_decay_tree
    from shift_gcn_tpu.train.state import create_train_state, make_train_step

    print("devices:", jax.devices(), flush=True)
    config = ModelConfig(
        num_class=2, num_point=33, num_person=1, graph="mediapipe_pose",
        activation_dtype="bfloat16")
    state = create_train_state(jax.random.key(0), config)
    wd = build_weight_decay_tree(state.params)
    step = jax.jit(make_train_step(config, wd), donate_argnums=(0,))
    rng = np.random.default_rng(0)
    batch = {
        "data": jax.device_put(rng.standard_normal(
            (64, 3, 300, 33, 1)).astype(np.float32)),
        "label": jax.device_put(rng.integers(0, 2, 64).astype(np.int32)),
    }
    lr = jnp.asarray(0.1, jnp.float32)
    for _ in range(3):
        state, m = step(state, batch, lr)
    jax.block_until_ready(m)
    jax.profiler.start_trace(TRACE_DIR)
    for _ in range(5):
        state, m = step(state, batch, lr)
    jax.block_until_ready(m)
    jax.profiler.stop_trace()


def summarize():
    paths = glob.glob(os.path.join(
        TRACE_DIR, "**", "*.trace.json.gz"), recursive=True)
    if not paths:
        print("no trace files under", TRACE_DIR)
        return
    path = max(paths, key=os.path.getmtime)
    print("trace:", path, flush=True)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # keep only complete events on TPU op tracks (pid/tid naming varies;
    # filter to events with a duration and an op-like name)
    by_name = defaultdict(float)
    total = 0.0
    for ev in events:
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        name = ev.get("name", "")
        if not name or name.startswith(("$", "process_")):
            continue
        args = ev.get("args") or {}
        # prefer grouping by the HLO category when present
        key = args.get("hlo_category") or name
        by_name[key] += ev["dur"]
        total += ev["dur"]
    print(f"\ntop op groups by total device time "
          f"(us over 5 steps; grand total {total:.0f}):")
    for name, dur in sorted(by_name.items(), key=lambda kv: -kv[1])[:40]:
        print(f"  {dur:12.0f}  {100 * dur / max(total, 1):5.1f}%  {name}")


if __name__ == "__main__":
    run_steps()
    summarize()
