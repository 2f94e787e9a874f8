"""Sequence parallelism end to end at the production data shape
(VERDICT r2 item 4): T=300 clips (the reference's fixed shape,
feeder.py:74-90) padded to 304 by the feeder's normalize-aware
pad_to_frames compose with `shard_time: true` in a real Trainer run on
the (4, 2) mesh — config-launchable via configs/mediapipe/train_seqpar.yaml."""

import os
import pickle

import numpy as np
import pytest

from shift_gcn_tpu.models.shift_gcn import BlockSpec, ModelConfig
from shift_gcn_tpu.train.config import ExperimentConfig, load_config
from shift_gcn_tpu.train.trainer import Trainer


def _tiny_config():
    # production structure rules in miniature: two stride-2 blocks, so
    # T=304 -> 152 local (2 time shards) -> 76 -> 38 mirrors the real
    # 10-block backbone's divisibility chain
    return ModelConfig(
        num_class=2, num_point=33, num_person=1, graph="mediapipe_pose",
        blocks=(
            BlockSpec(3, 8, residual=False),
            BlockSpec(8, 8, stride=2),
            BlockSpec(8, 16, stride=2),
        ))


def _write_t300_dataset(tmp_path, n=16, v=33, m=1, seed=0):
    """Production-shaped data: (N, 3, 300, V, 1) — T=300 does NOT shard
    2-way through the stride-2 chain, so this only trains if the
    feeder's pad_to_frames=304 actually composes."""
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, 2, n)
    data = rng.standard_normal((n, 3, 300, v, m)).astype(np.float32) * 0.1
    drift = np.linspace(0, 1, 300)[:, None, None]
    for i in range(n):
        if labels[i] == 1:
            data[i, 1] += drift
    names = [f"sample{i}.skeleton" for i in range(n)]
    np.save(tmp_path / "data.npy", data)
    with open(tmp_path / "label.pkl", "wb") as f:
        pickle.dump((names, labels.tolist()), f)
    return str(tmp_path / "data.npy"), str(tmp_path / "label.pkl")


@pytest.fixture(scope="module")
def trainer(tmp_path_factory):
    import jax
    from shift_gcn_tpu.train import state as state_lib
    from shift_gcn_tpu.train.optim import build_weight_decay_tree

    tmp_path = tmp_path_factory.mktemp("seqpar_train")
    data_path, label_path = _write_t300_dataset(tmp_path)
    cfg = ExperimentConfig(
        Experiment_name="seqpar_smoke",
        work_dir=str(tmp_path / "work_dir"),
        model_saved_name=str(tmp_path / "save_models"),
        train_feeder_args={"data_path": data_path,
                           "label_path": label_path,
                           "pad_to_frames": 304},
        test_feeder_args={"data_path": data_path,
                          "label_path": label_path,
                          "pad_to_frames": 304},
        batch_size=8, test_batch_size=8, base_lr=0.1,
        step=[100], num_epoch=2, nesterov=True,
        mesh_shape=[4, 2], shard_time=True,
    )
    tr = Trainer(cfg)
    tr.model_config = _tiny_config()
    tr.state = state_lib.create_train_state(
        jax.random.key(0), tr.model_config)
    tr.wd_tree = build_weight_decay_tree(tr.state.params)
    tr._build_steps()
    return tr


def test_feeder_pads_to_304(trainer):
    clip = trainer.feeders["train"].get(0)
    assert clip.shape[1] == 304


def test_trains_at_production_shape(trainer):
    m0 = trainer.train_epoch(0)
    m1 = trainer.train_epoch(1)
    assert np.isfinite(m0["loss"]) and np.isfinite(m1["loss"])
    assert m1["loss"] < m0["loss"], (m0, m1)


def test_eval_and_scores(trainer):
    acc = trainer.evaluate(1)
    assert 0.0 <= acc <= 1.0
    assert os.path.exists(os.path.join(
        trainer.work_dir, "eval_results", "best_acc.pkl"))


def test_unpadded_t300_is_rejected_at_trace_time(tmp_path):
    """Without pad_to_frames the production shape must fail loudly (the
    seqpar trace-time validation, parallel/seqpar.py:41-66), not train
    subtly wrong."""
    import jax
    from shift_gcn_tpu.train import state as state_lib
    from shift_gcn_tpu.train.optim import build_weight_decay_tree

    data_path, label_path = _write_t300_dataset(tmp_path, n=8)
    cfg = ExperimentConfig(
        Experiment_name="seqpar_bad",
        work_dir=str(tmp_path / "work_dir"),
        model_saved_name=str(tmp_path / "save_models"),
        train_feeder_args={"data_path": data_path,
                           "label_path": label_path},
        test_feeder_args={"data_path": data_path,
                          "label_path": label_path},
        batch_size=8, test_batch_size=8,
        num_epoch=1, mesh_shape=[4, 2], shard_time=True,
    )
    tr = Trainer(cfg)
    tr.model_config = _tiny_config()
    tr.state = state_lib.create_train_state(
        jax.random.key(0), tr.model_config)
    tr.wd_tree = build_weight_decay_tree(tr.state.params)
    tr._build_steps()
    with pytest.raises(ValueError, match="shard_time"):
        tr.train_epoch(0)


def test_yaml_config_parses():
    root = os.path.join(os.path.dirname(__file__), "..")
    cfg = load_config(
        ["--config",
         os.path.join(root, "configs", "mediapipe", "train_seqpar.yaml")])
    assert cfg.shard_time and cfg.mesh_shape == [4, 2]
    assert cfg.train_feeder_args["pad_to_frames"] == 304
    assert cfg.test_feeder_args["pad_to_frames"] == 304
