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


def test_auto_detect_checkpoints_both_layouts(tmp_path):
    """Per-modality auto-detect over a save-models root (reference
    inference_pipeline.py:28-38): Orbax run dirs by experiment name with
    highest step; reference .pt files by highest epoch; 'joint' must not
    swallow 'joint_motion'."""
    import os

    from shift_gcn_tpu.inference.pipeline import auto_detect_checkpoints

    root = tmp_path / "save_models"
    for exp, steps in (("mediapipe_joint", [2, 5]),
                       ("mediapipe-bone", [3]),
                       ("mediapipe_joint_motion", [1])):
        for s in steps:
            d = root / exp / str(s)
            d.mkdir(parents=True)
            (d / "dummy").touch()
    (root / "mediapipe_ShiftGCN_bone_motion-40-1000.pt").touch()
    (root / "mediapipe_ShiftGCN_bone_motion-60-1500.pt").touch()

    found = auto_detect_checkpoints(str(root))
    assert set(found) == {"joint", "bone", "joint_motion", "bone_motion"}
    assert found["joint"].endswith(os.path.join("mediapipe_joint", "5"))
    assert found["bone"].endswith(os.path.join("mediapipe-bone", "3"))
    assert found["joint_motion"].endswith(
        os.path.join("mediapipe_joint_motion", "1"))
    assert found["bone_motion"].endswith("-60-1500.pt")
    # empty/missing root -> empty dict
    assert auto_detect_checkpoints(str(tmp_path / "nope")) == {}
    # two runs for one modality: the HIGHEST STEP wins, not the
    # alphabetically-first experiment dir
    d = root / "zz_newer_joint" / "9"
    d.mkdir(parents=True)
    (d / "dummy").touch()
    found = auto_detect_checkpoints(str(root))
    assert found["joint"].endswith(os.path.join("zz_newer_joint", "9"))


def _write_test_video(path, n_frames=20, w=64, h=48):
    import cv2

    writer = cv2.VideoWriter(
        str(path), cv2.VideoWriter_fourcc(*"mp4v"), 10, (w, h))
    rng = np.random.default_rng(0)
    for _ in range(n_frames):
        writer.write(rng.integers(0, 255, (h, w, 3), np.uint8))
    writer.release()
    return n_frames, w, h


def test_run_pipeline_writes_annotated_video(tmp_path, tiny_checkpoints):
    """End-to-end: video file -> report + annotated mp4 with the same
    frame count (reference wiring inference_pipeline.py:663-667), with
    the skeleton overlay fed by backend pixel landmarks."""
    import cv2

    from shift_gcn_tpu.data.gendata import mediapipe as mp_gen
    from shift_gcn_tpu.inference.pipeline import run_pipeline

    cfg, paths = tiny_checkpoints
    video = tmp_path / "vid.mp4"
    n_frames, w, h = _write_test_video(video)

    rng = np.random.default_rng(1)

    def fake_backend(path, max_frame):
        t = min(n_frames, max_frame)
        world = rng.standard_normal((3, t, 33, 1)).astype(np.float32)
        pixel = rng.uniform(1, min(w, h) - 1, (t, 33, 2)).astype(np.float32)
        return world, pixel

    mp_gen.register_backend("fake_pixel", fake_backend)
    try:
        out_video = tmp_path / "annotated.mp4"
        out_json = tmp_path / "report.json"
        report = run_pipeline(
            str(video), paths, model_config=cfg,
            output_json=str(out_json), output_video=str(out_video),
            window=16, stride=8, pose_backend="fake_pixel")
    finally:
        mp_gen._BACKENDS.pop("fake_pixel", None)

    assert report["annotated_video"] == str(out_video)
    assert out_json.exists()
    cap = cv2.VideoCapture(str(out_video))
    assert cap.isOpened()
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == n_frames
    assert int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)) == w
    cap.release()
    assert report["total_frames"] == n_frames


def test_gui_resolve_checkpoints(tmp_path, tiny_checkpoints):
    """GUI directory resolution: a save-models root -> 4-stream dict; a
    single run dir -> joint-only; a fourstream run dir -> fourstream."""
    import shutil

    from shift_gcn_tpu.inference.gui import resolve_checkpoints

    cfg, paths = tiny_checkpoints
    root = tmp_path / "save_models"
    root.mkdir()
    for modality in ("joint", "bone"):
        shutil.copytree(paths[modality].rsplit("/", 1)[0],
                        root / f"mediapipe_{modality}")
    ckpts, fourstream = resolve_checkpoints(str(root))
    assert fourstream is None and set(ckpts) == {"joint", "bone"}

    single = paths["joint"].rsplit("/", 1)[0]
    ckpts, fourstream = resolve_checkpoints(single)
    assert fourstream is None and set(ckpts) == {"joint"}

    fs_dir = tmp_path / "mediapipe_fourstream"
    shutil.copytree(single, fs_dir)
    ckpts, fourstream = resolve_checkpoints(str(fs_dir))
    assert ckpts is None and fourstream is not None

    # a concrete Orbax step dir and a reference .pt file pass through
    ckpts, fourstream = resolve_checkpoints(paths["joint"])
    assert fourstream is None and ckpts == {"joint": paths["joint"]}
    pt = tmp_path / "model_joint-40-1000.pt"
    pt.touch()
    ckpts, fourstream = resolve_checkpoints(str(pt))
    assert fourstream is None and ckpts == {"joint": str(pt)}
