"""Probe: full-size convergence proxy on TPU (VERDICT round-1 item 6).

Trains the ACTUAL shipped configuration — 10-block MediaPipe backbone,
T=300, batch 64, bf16 activations, dft lowerings — for a few hundred steps
on separable synthetic data (class 1 drifts upward over time, same
construction as tests/test_training.py) and logs the loss/accuracy curve.
Success = loss drops steadily to near zero and train accuracy saturates,
evidence that the shipped defaults (frequency-domain lowerings + mixed
precision + constraint VJP) optimize the full model end to end.

Run detached: nohup python scratch/probe_convergence.py > scratch/convergence_r2.log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def main():
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
    n, t, v = 512, 300, 33
    labels = rng.integers(0, 2, n).astype(np.int32)
    data = (rng.standard_normal((n, 3, t, v, 1)) * 0.1).astype(np.float32)
    drift = np.linspace(0, 1, t)[:, None, None]
    for i in range(n):
        if labels[i] == 1:
            data[i, 1] += drift

    batch_size = 64
    steps = 300
    lr = jnp.asarray(0.1, jnp.float32)
    t0 = time.time()
    order = rng.permutation(n)
    losses = []
    for s in range(steps):
        idx = order[(s * batch_size) % n:][:batch_size]
        if len(idx) < batch_size:
            order = rng.permutation(n)
            idx = order[:batch_size]
        batch = {
            "data": jax.device_put(data[idx]),
            "label": jax.device_put(labels[idx]),
        }
        state, m = step(state, batch, lr)
        losses.append(m)
        if (s + 1) % 10 == 0:
            loss = float(np.asarray(m["loss"]))
            acc = float(np.asarray(m["acc"]))
            print(f"step {s + 1:4d}  loss {loss:.4f}  acc {acc:.3f}  "
                  f"({time.time() - t0:.0f}s)", flush=True)
    final_loss = float(np.mean(
        [np.asarray(m["loss"]) for m in losses[-10:]]))
    final_acc = float(np.mean(
        [np.asarray(m["acc"]) for m in losses[-10:]]))
    print(f"FINAL last-10 mean: loss {final_loss:.4f}  acc {final_acc:.3f}")
    print("PASS" if final_loss < 0.1 and final_acc > 0.97 else "FAIL")


if __name__ == "__main__":
    main()
