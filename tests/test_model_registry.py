"""Model-family registry: selection by name and by reference dotted path,
plus an end-to-end ST-GCN training run through the Trainer."""

import numpy as np
import pytest

from shift_gcn_tpu.models.registry import get_model
from tests.test_training import _write_synthetic_dataset


def test_reference_dotted_path_resolves():
    assert get_model("model.shift_gcn.Model").name == "shift_gcn"
    assert get_model("shift_gcn_tpu.models.shift_gcn").name == "shift_gcn"
    assert get_model("stgcn").name == "stgcn"
    with pytest.raises(KeyError):
        get_model("nope")


def test_trainer_runs_stgcn_family(tmp_path):
    from shift_gcn_tpu.train.config import ExperimentConfig
    from shift_gcn_tpu.train.trainer import Trainer

    data_path, label_path = _write_synthetic_dataset(tmp_path, n=16, seed=9)
    cfg = ExperimentConfig(
        Experiment_name="stgcn_smoke",
        work_dir=str(tmp_path / "wd"),
        model_saved_name=str(tmp_path / "sm"),
        model="stgcn",
        model_args={"num_class": 2, "num_point": 25, "num_person": 1,
                    "graph": "ntu_rgb_d", "channels": [8, 16],
                    "strides": [1, 2]},
        train_feeder_args={"data_path": data_path, "label_path": label_path},
        test_feeder_args={"data_path": data_path, "label_path": label_path},
        batch_size=8, test_batch_size=8, num_epoch=1,
    )
    tr = Trainer(cfg)
    m0 = tr.train_epoch(0)
    for e in range(1, 4):
        m = tr.train_epoch(e)
    assert m["loss"] < m0["loss"]
    acc = tr.evaluate(3)
    assert 0.0 <= acc <= 1.0
