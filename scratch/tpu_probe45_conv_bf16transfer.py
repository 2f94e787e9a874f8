"""Probe 45: full-size convergence under transfer_dtype=bfloat16 (the
new auto default for bf16-activation runs).  Same protocol as
probe_convergence — 300 steps, 10-block MediaPipe backbone, separable
synthetic data — with the batch quantized to bf16 on the host and cast
back to fp32 on device (the trainer's exact path).

Run:  cd /root/repo && nohup python scratch/tpu_probe45_conv_bf16transfer.py \
          > scratch/queue45.log 2>&1 & echo $! > scratch/queue45.pid
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp
import ml_dtypes


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
    base = make_train_step(config, wd)

    def step_fn(s, batch, lr_):
        return base(s, dict(batch,
                            data=batch["data"].astype(jnp.float32)), lr_)

    step = jax.jit(step_fn, donate_argnums=(0,))

    rng = np.random.default_rng(0)
    n, t, v = 512, 300, 33
    labels = rng.integers(0, 2, n).astype(np.int32)
    data = (rng.standard_normal((n, 3, t, v, 1)) * 0.1).astype(np.float32)
    drift = np.linspace(0, 1, t)[:, None, None]
    for i in range(n):
        if labels[i] == 1:
            data[i, 1] += drift
    data = data.astype(ml_dtypes.bfloat16)   # the transfer quantization

    batch_size, steps = 64, 300
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
        if (s + 1) % 50 == 0:
            print(f"step {s + 1:4d}  loss "
                  f"{float(np.asarray(m['loss'])):.4f}  acc "
                  f"{float(np.asarray(m['acc'])):.3f}  "
                  f"({time.time() - t0:.0f}s)", flush=True)
    final_loss = float(np.mean(
        [np.asarray(m["loss"]) for m in losses[-10:]]))
    final_acc = float(np.mean(
        [np.asarray(m["acc"]) for m in losses[-10:]]))
    print(f"FINAL last-10 mean: loss {final_loss:.4f}  acc {final_acc:.3f}")
    print("PASS" if final_loss < 0.1 and final_acc > 0.97 else "FAIL")


if __name__ == "__main__":
    main()
