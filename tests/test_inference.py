"""Inference pipeline: sliding windows, per-frame aggregation, interval
detection, and the full landmarks -> report path with real checkpoints."""

import numpy as np
import pytest

import jax

from shift_gcn_tpu.inference.pipeline import (
    EnsemblePredictor, aggregate_per_frame, create_sliding_windows,
    detect_fall_intervals, run_on_landmarks)
from shift_gcn_tpu.models.shift_gcn import BlockSpec, ModelConfig


def test_sliding_windows_cover_and_pad():
    data = np.ones((3, 700, 33, 1), np.float32)
    windows, spans = create_sliding_windows(data, window=300, stride=150)
    assert windows.shape[1:] == (3, 300, 33, 1)
    assert spans[0] == (0, 300)
    # every frame covered
    covered = np.zeros(700, bool)
    for s, e in spans:
        covered[s:e] = True
    assert covered.all()
    # short sequence -> single zero-padded window
    w2, sp2 = create_sliding_windows(
        np.ones((3, 100, 33, 1), np.float32), 300, 150)
    assert w2.shape[0] == 1 and sp2 == [(0, 100)]
    assert w2[0, :, 100:].sum() == 0


def test_aggregate_per_frame_averages_overlaps():
    probs = np.array([0.2, 0.8])
    spans = [(0, 4), (2, 6)]
    out = aggregate_per_frame(probs, spans, 6)
    np.testing.assert_allclose(out[:2], 0.2)
    np.testing.assert_allclose(out[2:4], 0.5)
    np.testing.assert_allclose(out[4:6], 0.8)


def test_detect_fall_intervals():
    probs = np.array([0.1, 0.6, 0.7, 0.2, 0.9, 0.9, 0.1])
    ivs = detect_fall_intervals(probs, threshold=0.5)
    assert [(iv.start_frame, iv.end_frame) for iv in ivs] == [(1, 2), (4, 5)]
    assert ivs[1].peak_prob == pytest.approx(0.9)


@pytest.fixture(scope="module")
def tiny_checkpoints(tmp_path_factory):
    from shift_gcn_tpu.train.state import create_train_state
    from shift_gcn_tpu.utils import checkpoint as ckpt_lib

    cfg = ModelConfig(
        num_class=2, num_point=33, num_person=1, graph="mediapipe_pose",
        blocks=(BlockSpec(3, 8, residual=False),
                BlockSpec(8, 8, stride=2)))
    root = tmp_path_factory.mktemp("ckpts")
    paths = {}
    for i, modality in enumerate(["joint", "bone"]):
        state = create_train_state(jax.random.key(i), cfg)
        payload = {
            "params": state.params, "bn_state": state.bn_state,
            "opt_state": state.opt_state,
            "global_step": state.global_step,
            "meta": {"epoch": 0, "best_acc": 0.0},
        }
        paths[modality] = ckpt_lib.save_checkpoint(
            str(root / modality), 3, payload)
    return cfg, paths


def test_run_on_landmarks_end_to_end(tiny_checkpoints):
    cfg, paths = tiny_checkpoints
    predictor = EnsemblePredictor(
        paths, model_config=cfg, alpha=(0.6, 0.6, 0.4, 0.4))
    rng = np.random.default_rng(0)
    landmarks = rng.standard_normal((3, 250, 33, 1)).astype(np.float32)
    report = run_on_landmarks(
        landmarks, predictor, window=64, stride=32, threshold=0.5)
    assert report["total_frames"] == 250
    assert report["num_windows"] >= 7
    assert len(report["frame_probabilities"]) == 250
    assert 0.0 <= report["max_fall_probability"] <= 1.0
    assert isinstance(report["fall_detected"], bool)


def test_checkpoint_autodetect_latest(tiny_checkpoints):
    cfg, paths = tiny_checkpoints
    # pass the parent dir -> predictor picks the max-step checkpoint
    parent = paths["joint"].rsplit("/", 1)[0]
    predictor = EnsemblePredictor({"joint": parent}, model_config=cfg)
    assert predictor is not None
