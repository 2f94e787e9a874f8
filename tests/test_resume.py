"""Resume semantics: explicit path and auto-resume from latest checkpoint,
driven entirely through the config system (tiny backbone via model_args)."""

import numpy as np
import pytest

from tests.test_training import _write_synthetic_dataset

TINY_MODEL_ARGS = {
    "num_class": 2, "num_point": 25, "num_person": 1,
    "graph": "ntu_rgb_d",
    "blocks": [[3, 8, 1, False], [8, 8, 2, True]],
}


def _make_trainer(tmp_path, resume=None, name="resume_exp"):
    from shift_gcn_tpu.train.config import ExperimentConfig
    from shift_gcn_tpu.train.trainer import Trainer

    if not (tmp_path / "data.npy").exists():
        _write_synthetic_dataset(tmp_path, n=16, seed=5)
    cfg = ExperimentConfig(
        Experiment_name=name,
        work_dir=str(tmp_path / "wd"),
        model_saved_name=str(tmp_path / "sm"),
        train_feeder_args={"data_path": str(tmp_path / "data.npy"),
                           "label_path": str(tmp_path / "label.pkl")},
        test_feeder_args={"data_path": str(tmp_path / "data.npy"),
                          "label_path": str(tmp_path / "label.pkl")},
        model_args=TINY_MODEL_ARGS,
        batch_size=8, test_batch_size=8, num_epoch=2, resume=resume,
    )
    return Trainer(cfg)


def test_auto_resume_no_checkpoint_starts_fresh(tmp_path):
    tr = _make_trainer(tmp_path, resume="auto")
    assert tr.start_epoch == 0


def test_auto_resume_picks_latest(tmp_path):
    tr = _make_trainer(tmp_path)
    tr.train_epoch(0)
    tr.best_acc = 0.75
    tr.save(epoch=0)
    tr.train_epoch(1)
    tr.save(epoch=1)
    step_after = int(tr.state.global_step)

    tr2 = _make_trainer(tmp_path, resume="auto")
    assert tr2.start_epoch == 2
    assert int(tr2.state.global_step) == step_after
    assert tr2.best_acc == pytest.approx(0.75)
    import jax
    for a, b in zip(jax.tree_util.tree_leaves(tr.state.params),
                    jax.tree_util.tree_leaves(tr2.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_blocks_from_model_args():
    from shift_gcn_tpu.models.shift_gcn import config_from_reference_args

    cfg = config_from_reference_args(TINY_MODEL_ARGS)
    assert len(cfg.blocks) == 2
    assert cfg.blocks[0].residual is False
    assert cfg.blocks[1].stride == 2
