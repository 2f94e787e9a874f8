"""Verify probe: drive the new StreamingFallDetector on the real TPU.

Healthcheck matmul first (pinned precision per CLAUDE.md), then a tiny
2-block predictor at window=160 (T >= 128 per the eval-graph gotcha),
streamed frame-by-frame with hop=40, finalize, and offline-parity check
vs run_on_landmarks on the same sequence.
"""
import time

import numpy as np

import jax
import jax.numpy as jnp

t0 = time.time()
dev = jax.devices()[0]
print("device:", dev, flush=True)

# healthcheck
a = np.random.default_rng(0).standard_normal((128, 128)).astype(np.float32)
r = jax.jit(lambda x: jnp.dot(x, x, precision="highest"))(a)
np.testing.assert_allclose(np.asarray(r), a @ a, rtol=1e-4, atol=1e-4)
print(f"healthcheck ok ({time.time()-t0:.1f}s)", flush=True)

from shift_gcn_tpu.inference.pipeline import EnsemblePredictor, run_on_landmarks
from shift_gcn_tpu.inference.streaming import StreamingFallDetector
from shift_gcn_tpu.models.shift_gcn import BlockSpec, ModelConfig
from shift_gcn_tpu.train.state import create_train_state

cfg = ModelConfig(
    num_class=2, num_point=33, num_person=1, graph="mediapipe_pose",
    blocks=(BlockSpec(3, 8, residual=False), BlockSpec(8, 8, stride=2)))
state = create_train_state(jax.random.key(0), cfg)

pred = EnsemblePredictor.__new__(EnsemblePredictor)
from shift_gcn_tpu.graphs import get_graph
pred.config = cfg
pred.graph = get_graph(cfg.graph)
pred.alpha = {"joint": 1.0}
pred._models = {"joint": (state.params, state.bn_state)}
pred._forward = jax.jit(pred._forward_impl)

WINDOW, HOP, T = 160, 40, 400
rng = np.random.default_rng(1)
landmarks = rng.standard_normal((3, T, 33, 1)).astype(np.float32)

det = StreamingFallDetector(pred, window=WINDOW, hop=HOP, threshold=0.5)
updates = []
t1 = time.time()
for i in range(T):
    upd = det.push(landmarks[:, i])
    if upd is not None:
        updates.append(upd)
online = det.finalize()
print(f"stream done: {len(updates)} updates, "
      f"{online['num_windows']} windows ({time.time()-t1:.1f}s incl "
      f"compile)", flush=True)

offline = run_on_landmarks(landmarks, pred, window=WINDOW, stride=HOP,
                           threshold=0.5)
# TPU default matmul precision is bf16 (CLAUDE.md 2026-08-18 platform
# note): the batched (W=7) offline forward and the W=1 streaming forward
# round differently at bf16 scale, so parity here is the bf16 envelope
# (~5e-4 observed); exact-parity coverage is the CPU test suite
# (tests/test_streaming.py, rtol 1e-5).
np.testing.assert_allclose(online["frame_probabilities"],
                           offline["frame_probabilities"],
                           rtol=2e-3, atol=2e-3)
assert online["num_windows"] == offline["num_windows"]
assert ([(iv["start_frame"], iv["end_frame"])
         for iv in online["fall_intervals"]]
        == [(iv["start_frame"], iv["end_frame"])
            for iv in offline["fall_intervals"]])

# steady-state latency of one streaming evaluation (post-compile)
t2 = time.time()
n_evals = 0
det2 = StreamingFallDetector(pred, window=WINDOW, hop=HOP)
for i in range(T):
    if det2.push(landmarks[:, i]) is not None:
        n_evals += 1
dt = time.time() - t2
print(f"steady-state: {n_evals} evals in {dt*1000:.0f} ms "
      f"({dt/n_evals*1000:.1f} ms/eval incl host prenorm)", flush=True)
print("PROBE53 PASS (TPU streaming parity)", flush=True)
