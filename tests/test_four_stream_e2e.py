"""The flagship end-to-end flow (BASELINE.json config #5, scaled down):
derive 4 modalities from synthetic joint data, train one model per stream
through the Trainer, ensemble the per-stream score pickles, and run the
inference predictor on the trained checkpoints."""

import os
import pickle

import numpy as np
import pytest

from shift_gcn_tpu.data.modalities import derive_modalities
from shift_gcn_tpu.graphs import MEDIAPIPE_POSE


# long-pole module: deselect with -m "not slow" for the inner-loop tier
pytestmark = pytest.mark.slow

MODEL_ARGS = {
    "num_class": 2, "num_point": 33, "num_person": 1,
    "graph": "mediapipe_pose",
    "blocks": [[3, 8, 1, False], [8, 8, 2, True]],
}
STREAMS = ("joint", "bone", "joint_motion", "bone_motion")


@pytest.fixture(scope="module")
def pipeline(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    rng = np.random.default_rng(0)
    n, t, v = 32, 16, 33
    labels = rng.integers(0, 2, n)
    joint = (rng.standard_normal((n, 3, t, v, 1)) * 0.1).astype(np.float32)
    # class 1 "grows" over time: a scale signal survives every modality
    # transform (bone differences, frame differences), unlike a global
    # translation which cancels in the bone stream
    grow = (1.0 + 0.6 * np.linspace(0, 1, t))[:, None, None]
    for i in range(n):
        if labels[i] == 1:
            joint[i] *= grow
    names = [f"clip{i}" for i in range(n)]

    mods = derive_modalities(joint, MEDIAPIPE_POSE)
    for stream in STREAMS:
        np.save(root / f"train_data_{stream}.npy", mods[stream])
    with open(root / "train_label.pkl", "wb") as f:
        pickle.dump((names, labels.tolist()), f)
    return root, names, labels


def _train_stream(root, stream, epochs=16):
    from shift_gcn_tpu.train.config import ExperimentConfig
    from shift_gcn_tpu.train.trainer import Trainer

    cfg = ExperimentConfig(
        Experiment_name=f"e2e_{stream}",
        work_dir=str(root / "work_dir"),
        model_saved_name=str(root / "save_models"),
        model_args=MODEL_ARGS,
        train_feeder_args={
            "data_path": str(root / f"train_data_{stream}.npy"),
            "label_path": str(root / "train_label.pkl")},
        test_feeder_args={
            "data_path": str(root / f"train_data_{stream}.npy"),
            "label_path": str(root / "train_label.pkl")},
        batch_size=8, test_batch_size=8, num_epoch=epochs,
        eval_interval=epochs, save_interval=epochs, nesterov=True,
        base_lr=0.05, step=[100],
    )
    return Trainer(cfg).start()


def test_four_stream_train_ensemble_infer(pipeline):
    root, names, labels = pipeline
    accs = {}
    for stream in STREAMS:
        accs[stream] = _train_stream(root, stream)
        score_path = (root / "work_dir" / f"e2e_{stream}"
                      / "eval_results" / "best_acc.pkl")
        assert score_path.exists(), f"missing scores for {stream}"

    # every stream learned something on separable data
    assert all(a >= 0.7 for a in accs.values()), accs

    # weighted ensemble over the trainer's score pickles
    from shift_gcn_tpu.ensemble import run_ensemble

    result = run_ensemble(
        str(root / "train_label.pkl"),
        [str(root / "work_dir" / f"e2e_{s}" / "eval_results"
             / "best_acc.pkl") for s in STREAMS],
        binary_report=True,
    )
    assert result["top1"] >= max(accs.values()) - 0.05
    assert result["binary"]["tp"] + result["binary"]["fn"] == sum(labels)

    # inference predictor over the trained checkpoints
    from shift_gcn_tpu.inference.pipeline import (
        EnsemblePredictor, run_on_landmarks)
    from shift_gcn_tpu.models.shift_gcn import config_from_reference_args

    ckpts = {s: str(root / "save_models" / f"e2e_{s}") for s in STREAMS}
    predictor = EnsemblePredictor(
        ckpts, model_config=config_from_reference_args(MODEL_ARGS))
    rng = np.random.default_rng(7)
    landmarks = (rng.standard_normal((3, 40, 33, 1)) * 0.1).astype(
        np.float32)
    report = run_on_landmarks(
        landmarks, predictor, window=16, stride=8, threshold=0.5)
    assert report["total_frames"] == 40
    assert len(report["frame_probabilities"]) == 40
