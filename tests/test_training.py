"""End-to-end training slice on synthetic data: loss decreases, eval + score
pickles are written, checkpoint resume round-trips."""

import os
import pickle

import numpy as np
import pytest

from shift_gcn_tpu.models.shift_gcn import (
    BlockSpec, ModelConfig)


def _tiny_config():
    # 4-block tiny backbone so the CPU test stays fast; same structure rules
    # (no-residual first block, stride-2 downsample with residual conv).
    return ModelConfig(
        num_class=2, num_point=25, num_person=1, graph="ntu_rgb_d",
        blocks=(
            BlockSpec(3, 8, residual=False),
            BlockSpec(8, 8),
            BlockSpec(8, 16, stride=2),
            BlockSpec(16, 16),
        ))


def _write_synthetic_dataset(tmp_path, n=32, t=16, v=25, m=1, seed=0):
    """Two separable classes: class 1 drifts upward over time."""
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, 2, n)
    data = rng.standard_normal((n, 3, t, v, m)).astype(np.float32) * 0.1
    drift = np.linspace(0, 1, t)[:, None, None]
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
    from shift_gcn_tpu.train.config import ExperimentConfig
    from shift_gcn_tpu.train.trainer import Trainer

    tmp_path = tmp_path_factory.mktemp("train")
    data_path, label_path = _write_synthetic_dataset(tmp_path)
    cfg = ExperimentConfig(
        Experiment_name="synthetic_smoke",
        work_dir=str(tmp_path / "work_dir"),
        model_saved_name=str(tmp_path / "save_models"),
        train_feeder_args={"data_path": data_path,
                           "label_path": label_path},
        test_feeder_args={"data_path": data_path,
                          "label_path": label_path},
        batch_size=8, test_batch_size=8, base_lr=0.1,
        step=[100], num_epoch=3, nesterov=True,
    )
    tr = Trainer(cfg)
    tr.model_config = _tiny_config()
    # rebuild state/steps for the tiny config
    from shift_gcn_tpu.train import state as state_lib
    from shift_gcn_tpu.train.optim import build_weight_decay_tree
    tr.state = state_lib.create_train_state(
        jax.random.key(0), tr.model_config)
    tr.wd_tree = build_weight_decay_tree(tr.state.params)
    tr._build_steps()
    return tr


def test_loss_decreases_and_eval_writes_scores(trainer):
    m0 = trainer.train_epoch(0)
    for e in range(1, 6):
        m = trainer.train_epoch(e)
    assert m["loss"] < m0["loss"], (m0, m)
    acc = trainer.evaluate(5)
    assert 0.0 <= acc <= 1.0
    eval_dir = os.path.join(trainer.work_dir, "eval_results")
    pkls = os.listdir(eval_dir)
    assert any(p.startswith("epoch_") for p in pkls)
    assert "best_acc.pkl" in pkls
    with open(os.path.join(eval_dir, "best_acc.pkl"), "rb") as f:
        scores = pickle.load(f)
    assert len(scores) == 32
    assert next(iter(scores.values())).shape == (2,)


def test_best_pickle_regenerates_when_missing(trainer):
    """Recovery contract (code-review r5): when the historical best
    pickle is gone (kill during the final eval / overwrite cleanup) and
    the re-run's eval does NOT beat the checkpoint-restored best_acc,
    evaluate() must still restore the ensemble's score-pickle contract
    — without lowering the historical best_acc."""
    trainer.evaluate(0)
    eval_dir = os.path.join(trainer.work_dir, "eval_results")
    best = os.path.join(eval_dir, "best_acc.pkl")
    assert os.path.exists(best)
    os.remove(best)
    trainer.best_acc = 2.0     # unbeatable: the improvement branch is off
    trainer.evaluate(1)
    assert os.path.exists(best)
    assert trainer.best_acc == 2.0


def test_checkpoint_roundtrip(trainer, tmp_path):
    import jax
    import numpy as np
    path = trainer.save(epoch=5)
    from shift_gcn_tpu.utils import checkpoint as ckpt_lib
    template = {
        "params": trainer.state.params,
        "bn_state": trainer.state.bn_state,
        "opt_state": trainer.state.opt_state,
        "global_step": trainer.state.global_step,
        "meta": {"epoch": 0, "best_acc": 0.0},
    }
    restored = ckpt_lib.restore_checkpoint(path, template)
    assert int(restored["meta"]["epoch"]) == 5
    orig = jax.tree_util.tree_leaves(trainer.state.params)
    back = jax.tree_util.tree_leaves(restored["params"])
    for a, b in zip(orig, back):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert ckpt_lib.latest_checkpoint(trainer.save_dir) == path


def test_eval_handles_padded_final_batch(trainer, tmp_path):
    # 30 samples with batch 8 -> final batch carries 6 valid + 2 padded
    # (masked) samples; scores must cover exactly the 30 real samples.
    from shift_gcn_tpu.data.feeder import BatchIterator, Feeder
    data_path, label_path = _write_synthetic_dataset(tmp_path, n=30, seed=7)
    feeder = Feeder(data_path=data_path, label_path=label_path)
    trainer.feeders["test"] = feeder
    trainer.iterators["test"] = BatchIterator(
        feeder, 8, shuffle=False, drop_last=False)
    acc = trainer.evaluate(6)
    assert 0.0 <= acc <= 1.0
    with open(os.path.join(trainer.work_dir, "eval_results",
                           f"epoch_6_{acc}.pkl"), "rb") as f:
        scores = pickle.load(f)
    assert len(scores) == 30


def _mesh_cfg(tmp_path, name, t, **kw):
    from shift_gcn_tpu.train.config import ExperimentConfig
    data_path, label_path = _write_synthetic_dataset(tmp_path, n=16, t=t,
                                                     seed=2)
    return ExperimentConfig(
        Experiment_name=name,
        work_dir=str(tmp_path / "work_dir"),
        model_saved_name=str(tmp_path / "save_models"),
        train_feeder_args={"data_path": data_path, "label_path": label_path},
        test_feeder_args={"data_path": data_path, "label_path": label_path},
        model_args={"num_class": 2, "num_point": 25, "num_person": 1,
                    "graph": "ntu_rgb_d",
                    "blocks": [[3, 8, 1, 0], [8, 16, 2, 1]]},
        batch_size=8, test_batch_size=8, base_lr=0.1,
        step=[100], num_epoch=1, nesterov=True, device_guard=False,
        **kw)


def test_trainer_shard_time_end_to_end(tmp_path):
    """Trainer with shard_time: T sharded over the 'model' mesh axis in
    real training + eval (the integrated sequence-parallel mode)."""
    from shift_gcn_tpu.train.trainer import Trainer

    # T=48: T_local 24 per 2-way shard, >= MAX_SHIFT+1 after stride 2
    cfg = _mesh_cfg(tmp_path, "seqpar_smoke", t=48,
                    mesh_shape=[4, 2], shard_time=True)
    tr = Trainer(cfg)
    stats = tr.train_epoch(0)
    assert np.isfinite(stats["loss"])
    acc = tr.evaluate(0)
    assert 0.0 <= acc <= 1.0


def test_trainer_tensor_parallel_shards_params(tmp_path):
    """Trainer with a (4, 2) mesh and no shard_time: the TP rules shard
    Linear_weight over 'model' in the actual training state."""
    from shift_gcn_tpu.train.trainer import Trainer

    cfg = _mesh_cfg(tmp_path, "tp_smoke", t=16, mesh_shape=[4, 2])
    tr = Trainer(cfg)
    lw = tr.state.params["l1"]["gcn1"]["Linear_weight"]
    assert not lw.sharding.is_fully_replicated
    stats = tr.train_epoch(0)
    assert np.isfinite(stats["loss"])
    lw = tr.state.params["l1"]["gcn1"]["Linear_weight"]
    assert not lw.sharding.is_fully_replicated  # survives the step
    acc = tr.evaluate(0)
    assert 0.0 <= acc <= 1.0


def test_trainer_shard_time_with_feeder_padding(tmp_path):
    """pad_to_frames makes stride-incompatible raw T usable under
    shard_time: clips stored at T=44 are padded to 48 by the feeder and
    the sequence-parallel trainer runs end to end."""
    from shift_gcn_tpu.train.trainer import Trainer

    cfg = _mesh_cfg(tmp_path, "seqpar_padded", t=44,
                    mesh_shape=[4, 2], shard_time=True)
    cfg.train_feeder_args["pad_to_frames"] = 48
    cfg.test_feeder_args["pad_to_frames"] = 48
    tr = Trainer(cfg)
    stats = tr.train_epoch(0)
    assert np.isfinite(stats["loss"])


def test_trainer_shard_time_rejects_unsupported_family(tmp_path):
    """stgcn's apply has no time_axis: the Trainer must refuse at build
    time, not TypeError mid-trace."""
    from shift_gcn_tpu.train.trainer import Trainer

    cfg = _mesh_cfg(tmp_path, "seqpar_bad_family", t=48,
                    mesh_shape=[4, 2], shard_time=True)
    cfg.model = "stgcn"
    cfg.model_args = {"num_class": 2, "num_point": 25, "num_person": 1,
                      "graph": "ntu_rgb_d", "channels": [8, 16],
                      "strides": [1, 2]}
    with pytest.raises(ValueError, match="time_axis"):
        Trainer(cfg)


def test_batch_size_must_divide_mesh(tmp_path):
    import jax
    from shift_gcn_tpu.train.config import ExperimentConfig
    from shift_gcn_tpu.train.trainer import Trainer
    data_path, label_path = _write_synthetic_dataset(tmp_path, n=8, seed=1)
    cfg = ExperimentConfig(
        Experiment_name="bad_batch",
        work_dir=str(tmp_path / "work_dir"),
        model_saved_name=str(tmp_path / "save_models"),
        train_feeder_args={"data_path": data_path, "label_path": label_path},
        test_feeder_args={"data_path": data_path, "label_path": label_path},
        batch_size=5,
    )
    with pytest.raises(ValueError, match="divisible"):
        Trainer(cfg)


class TestTransferDtype:
    """transfer_dtype knob: 'auto' picks bf16 exactly when the model runs
    bf16 activations; the host batch ships compact and the step casts it
    back to fp32 on device (docs/PARITY.md known-deltas)."""

    def _trainer(self, tmp_path, name, **cfg_kw):
        import jax
        from shift_gcn_tpu.train import state as state_lib
        from shift_gcn_tpu.train.config import ExperimentConfig
        from shift_gcn_tpu.train.optim import build_weight_decay_tree
        from shift_gcn_tpu.train.trainer import Trainer

        data_path, label_path = _write_synthetic_dataset(tmp_path)
        cfg = ExperimentConfig(
            Experiment_name=name,
            work_dir=str(tmp_path / name / "w"),
            model_saved_name=str(tmp_path / name / "s"),
            train_feeder_args={"data_path": data_path,
                               "label_path": label_path},
            test_feeder_args={"data_path": data_path,
                              "label_path": label_path},
            batch_size=8, test_batch_size=8, num_epoch=1, **cfg_kw)
        tr = Trainer(cfg)
        import dataclasses
        tr.model_config = dataclasses.replace(
            _tiny_config(),
            activation_dtype=cfg_kw.get("activation_dtype"))
        tr.state = state_lib.create_train_state(
            jax.random.key(0), tr.model_config)
        tr.wd_tree = build_weight_decay_tree(tr.state.params)
        tr._build_steps()
        return tr

    def test_auto_is_fp32_without_bf16_activations(self, tmp_path):
        tr = self._trainer(tmp_path, "fp32auto")
        assert tr._transfer_dtype is np.float32
        m = tr.train_epoch(0)
        assert np.isfinite(m["loss"])

    def test_auto_is_bf16_with_bf16_activations(self, tmp_path):
        import ml_dtypes

        tr = self._trainer(tmp_path, "bf16auto",
                           activation_dtype="bfloat16")
        assert tr._transfer_dtype is ml_dtypes.bfloat16
        m = tr.train_epoch(0)
        assert np.isfinite(m["loss"])
        acc = tr.evaluate(0)
        assert 0.0 <= acc <= 1.0

    def test_explicit_float32_overrides_auto(self, tmp_path):
        tr = self._trainer(tmp_path, "fp32explicit",
                           activation_dtype="bfloat16",
                           transfer_dtype="float32")
        assert tr._transfer_dtype is np.float32

    def test_bad_value_rejected(self, tmp_path):
        with pytest.raises(ValueError, match="transfer_dtype"):
            self._trainer(tmp_path, "bad", transfer_dtype="int8")
