"""Streaming (online) fall detection: offline-report parity, warm-up
partial windows, hysteresis events, and API guards.

The reference pipeline is offline-only (inference_pipeline.py:574-670);
streaming.py extends its window semantics to a live feed.  The parity
tests here are the contract: at hop == offline stride, finalize()'s
report equals run_on_landmarks' on the same sequence.
"""

import numpy as np
import pytest

import jax

from shift_gcn_tpu.graphs import get_graph
from shift_gcn_tpu.inference.pipeline import (
    EnsemblePredictor, run_on_landmarks)
from shift_gcn_tpu.inference.streaming import (
    StreamingFallDetector, StreamUpdate, run_stream)
from shift_gcn_tpu.models.shift_gcn import BlockSpec, ModelConfig

WINDOW, HOP = 64, 32


@pytest.fixture(scope="module")
def ckpt_and_cfg(tmp_path_factory):
    from shift_gcn_tpu.train.state import create_train_state
    from shift_gcn_tpu.utils import checkpoint as ckpt_lib

    cfg = ModelConfig(
        num_class=2, num_point=33, num_person=1, graph="mediapipe_pose",
        blocks=(BlockSpec(3, 8, residual=False),
                BlockSpec(8, 8, stride=2)))
    root = tmp_path_factory.mktemp("stream_ckpts")
    state = create_train_state(jax.random.key(0), cfg)
    path = ckpt_lib.save_checkpoint(str(root / "joint"), 1, {
        "params": state.params, "bn_state": state.bn_state,
        "opt_state": state.opt_state, "global_step": state.global_step,
        "meta": {"epoch": 0, "best_acc": 0.0},
    })
    return cfg, path


@pytest.fixture(scope="module")
def predictor(ckpt_and_cfg):
    cfg, path = ckpt_and_cfg
    return EnsemblePredictor({"joint": path}, model_config=cfg)


@pytest.mark.parametrize("t", [40, 192, 250])
def test_offline_parity(predictor, t):
    """finalize() == run_on_landmarks at hop == stride: short stream
    (single padded window), aligned end, and unaligned end (tail
    window) all reproduce the offline report."""
    rng = np.random.default_rng(t)
    landmarks = rng.standard_normal((3, t, 33, 1)).astype(np.float32)
    offline = run_on_landmarks(
        landmarks, predictor, window=WINDOW, stride=HOP, threshold=0.5)
    online, _ = run_stream(
        landmarks, predictor, window=WINDOW, hop=HOP, threshold=0.5)
    assert online["total_frames"] == offline["total_frames"] == t
    assert online["num_windows"] == offline["num_windows"]
    np.testing.assert_allclose(
        online["frame_probabilities"], offline["frame_probabilities"],
        rtol=1e-5, atol=1e-6)
    assert ([(iv["start_frame"], iv["end_frame"])
             for iv in online["fall_intervals"]]
            == [(iv["start_frame"], iv["end_frame"])
                for iv in offline["fall_intervals"]])
    assert online["max_fall_probability"] == pytest.approx(
        offline["max_fall_probability"], rel=1e-5, abs=1e-6)


def test_update_cadence_and_spans(predictor):
    """Evaluations fire every `hop` frames; warm-up windows are flagged
    partial and excluded from the report's window count."""
    rng = np.random.default_rng(0)
    landmarks = rng.standard_normal((3, 128, 33, 1)).astype(np.float32)
    seen = []
    report, updates = run_stream(landmarks, predictor, window=WINDOW,
                                 hop=HOP, on_update=seen.append)
    assert seen == updates  # the live hook fires for every update
    assert [u.frame_index for u in updates] == [31, 63, 95, 127]
    assert [u.partial for u in updates] == [True, False, False, False]
    assert [u.span for u in updates] == [
        (0, 32), (0, 64), (32, 96), (64, 128)]
    # only the 3 full windows aggregate (offline spans for t=128)
    assert report["num_windows"] == 3
    assert all(isinstance(u, StreamUpdate) for u in updates)


def test_cli_streams_landmark_file(ckpt_and_cfg, tmp_path, capsys):
    """End-to-end CLI: replay a saved .npy landmark array, write the
    report JSON; --model-args selects the (tiny) trained architecture."""
    import json

    from shift_gcn_tpu.inference import streaming

    cfg, path = ckpt_and_cfg
    rng = np.random.default_rng(7)
    lm_file = tmp_path / "lm.npy"
    np.save(lm_file, rng.standard_normal((3, 96, 33, 1)).astype(np.float32))
    out = tmp_path / "report.json"
    streaming.main([
        "--landmarks", str(lm_file), "--joint", path,
        "--model-args",
        "{num_class: 2, num_point: 33, num_person: 1, "
        "graph: mediapipe_pose, blocks: [[3, 8, 1, false], [8, 8, 2]]}",
        "--window", str(WINDOW), "--hop", str(HOP),
        "--output", str(out)])
    report = json.loads(out.read_text())
    assert report["total_frames"] == 96
    # offline spans for t=96 at 64/32: (0,64) + (32,96)
    assert report["num_windows"] == 2
    assert len(report["frame_probabilities"]) == 96
    summary = capsys.readouterr().out
    assert '"total_frames": 96' in summary


class _ScriptedPredictor:
    """Fake predictor emitting a fixed fall-probability sequence (the
    real forward path is covered by the parity tests above)."""

    def __init__(self, probs):
        self.config = ModelConfig(
            num_class=2, num_point=33, num_person=1,
            graph="mediapipe_pose")
        self.graph = get_graph("mediapipe_pose")
        self._probs = list(probs)
        self.calls = 0

    def predict(self, batch):
        assert batch.shape == (1, 3, WINDOW, 33, 1)
        p = self._probs[self.calls]
        self.calls += 1
        return np.array([[1.0 - p, p]], np.float64)


def test_hysteresis_events():
    """min_consecutive suppresses single-window spikes; transitions fire
    as fall_start/fall_end exactly once per crossing."""
    # eval sequence: spike, quiet, two sustained highs, then low
    probs = [0.9, 0.1, 0.8, 0.8, 0.2]
    det = StreamingFallDetector(
        _ScriptedPredictor(probs), window=WINDOW, hop=HOP,
        threshold=0.5, min_consecutive=2)
    updates = []
    for i in range(5 * HOP):
        upd = det.push(np.zeros((3, 33, 1), np.float32))
        if upd is not None:
            updates.append(upd)
    assert [u.event for u in updates] == [
        None, None, None, "fall_start", "fall_end"]
    assert [u.fall_active for u in updates] == [
        False, False, False, True, False]


def test_immediate_start_with_min_consecutive_one():
    det = StreamingFallDetector(
        _ScriptedPredictor([0.7, 0.6, 0.3]), window=WINDOW, hop=HOP,
        threshold=0.5, min_consecutive=1)
    events = []
    for i in range(3 * HOP):
        upd = det.push(np.zeros((3, 33, 1), np.float32))
        if upd is not None:
            events.append(upd.event)
    assert events == ["fall_start", None, "fall_end"]


def test_finalize_surfaces_tail_and_closing_events():
    """A fall first crossing threshold in the tail window (scored only
    inside finalize) must still emit fall_start — and a fall open at
    stream end must get a closing fall_end — via report['final_updates']."""
    # evals: push at t=32 (partial, 0.1), t=64 (full, 0.1); finalize tail
    # [16, 80) scores 0.9 -> fall_start, then stream-end fall_end
    det = StreamingFallDetector(
        _ScriptedPredictor([0.1, 0.1, 0.9]), window=WINDOW, hop=HOP)
    for i in range(80):
        upd = det.push(np.zeros((3, 33, 1), np.float32))
        assert upd is None or upd.event is None
    report = det.finalize()
    events = [u["event"] for u in report["final_updates"]]
    assert events == ["fall_start", "fall_end"]
    assert report["final_updates"][0]["span"] == (16, 80)
    assert report["final_updates"][1]["fall_active"] is False
    # tail window recorded: offline spans for t=80 are (0,64) + (16,80)
    assert report["num_windows"] == 2


def test_finalize_reuses_last_partial_eval():
    """Stream length a hop multiple below one window: the last push
    already scored the exact padded buffer — finalize must reuse it (no
    duplicate forward, no double hysteresis count)."""
    pred = _ScriptedPredictor([0.8])
    det = StreamingFallDetector(pred, window=WINDOW, hop=HOP,
                                min_consecutive=1)
    events = []
    for i in range(HOP):
        upd = det.push(np.zeros((3, 33, 1), np.float32))
        if upd is not None:
            events.append(upd.event)
    report = det.finalize()
    assert pred.calls == 1  # no second forward in finalize
    assert events == ["fall_start"]  # delivered at push time...
    # ...so finalize adds only the stream-end closure, and the reused
    # score becomes the offline single padded window
    assert [u["event"] for u in report["final_updates"]] == ["fall_end"]
    assert report["num_windows"] == 1
    assert report["frame_probabilities"] == [0.8] * HOP


def test_api_guards():
    det = StreamingFallDetector(
        _ScriptedPredictor([0.1] * 8), window=WINDOW, hop=HOP)
    with pytest.raises(ValueError):
        det.push(np.zeros((3, 25, 1), np.float32))
    det.push(np.zeros((3, 33, 1), np.float32))
    report = det.finalize()
    assert report["total_frames"] == 1
    assert report["num_windows"] == 1  # offline single padded window
    with pytest.raises(RuntimeError):
        det.push(np.zeros((3, 33, 1), np.float32))
    with pytest.raises(RuntimeError):
        det.finalize()
    with pytest.raises(ValueError):
        StreamingFallDetector(_ScriptedPredictor([]), window=0)
    with pytest.raises(ValueError):
        StreamingFallDetector(_ScriptedPredictor([]), min_consecutive=0)
    # window must tile into hops, else leading frames would silently
    # aggregate to probability 0.0
    with pytest.raises(ValueError):
        StreamingFallDetector(_ScriptedPredictor([]), window=64, hop=48)
    with pytest.raises(ValueError):
        StreamingFallDetector(_ScriptedPredictor([]), window=64, hop=100)
    # empty stream: clean empty report, no evaluation
    empty = StreamingFallDetector(_ScriptedPredictor([]), window=WINDOW,
                                  hop=HOP)
    rep = empty.finalize()
    assert rep["total_frames"] == 0 and rep["num_windows"] == 0
    assert rep["fall_detected"] is False
