"""Ring-strategy training as a launchable config mode (VERDICT r3 task 4).

`edge_strategy: ring` + the ring_gnn family: node features sharded over
the mesh end to end, every aggregation a ppermute ring
(parallel/edge_partition.ring_aggregate).  Verified equal to the dense
unsharded trainer, launchable from configs/synthetic_ring.yaml, and
properly rejected for skeleton families (which gain nothing from
node-sharding at V<=33).
"""

import os
import pickle

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from shift_gcn_tpu.models import ring_gnn
from shift_gcn_tpu.parallel import edge_partition as ep
from shift_gcn_tpu.parallel import mesh as mesh_lib

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CFG = ring_gnn.RingGNNConfig(num_class=2, num_nodes=64, in_channels=6,
                              hidden=(16, 16), extra_edges=96)


def _data(n=32, seed=0):
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, 2, n)
    x = rng.standard_normal(
        (n, _CFG.in_channels, 1, _CFG.num_nodes, 1)).astype(np.float32) * 0.3
    lift = rng.choice(_CFG.num_nodes, 16, replace=False)
    for i in range(n):
        if labels[i] == 1:
            x[i, 0, 0, lift, 0] += 0.8
    return x, labels.astype(np.int32)


def test_ring_sharded_apply_equals_dense():
    mesh = mesh_lib.make_mesh((1, 8))
    params, state = ring_gnn.init_params(jax.random.key(0), _CFG)
    x, _ = _data()
    dense, _ = ring_gnn.apply(params, state, jnp.asarray(x), _CFG)
    sharded_apply = ep.make_ring_sharded_apply(_CFG, mesh)
    ring, _ = jax.jit(
        lambda p, s, d: sharded_apply(p, s, d, False))(
            params, state, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ring), np.asarray(dense),
                               atol=1e-5)


def test_ring_gnn_num_nodes_must_divide():
    cfg = ring_gnn.RingGNNConfig(num_nodes=60)
    mesh = mesh_lib.make_mesh((1, 8))
    with pytest.raises(ValueError, match="divide evenly"):
        ep.make_ring_sharded_apply(cfg, mesh)


def _write_ring_dataset(tmp_path):
    x, y = _data(n=32, seed=1)
    names = [f"r{i}.node" for i in range(len(y))]
    np.save(tmp_path / "data.npy", x)
    with open(tmp_path / "label.pkl", "wb") as f:
        pickle.dump((names, y.tolist()), f)
    return str(tmp_path / "data.npy"), str(tmp_path / "label.pkl")


def _trainer_from_yaml(tmp_path, data_path, label_path, **overrides):
    import yaml

    from shift_gcn_tpu.train.config import load_config
    from shift_gcn_tpu.train.trainer import Trainer

    with open(os.path.join(ROOT, "configs", "synthetic_ring.yaml")) as f:
        cfg_dict = yaml.safe_load(f)
    cfg_dict.update({
        "work_dir": str(tmp_path / "work"),
        "model_saved_name": str(tmp_path / "save"),
        "model_args": {"num_class": 2, "num_nodes": _CFG.num_nodes,
                       "in_channels": _CFG.in_channels,
                       "hidden": list(_CFG.hidden),
                       "extra_edges": _CFG.extra_edges},
        "train_feeder_args": {"data_path": data_path,
                              "label_path": label_path},
        "test_feeder_args": {"data_path": data_path,
                             "label_path": label_path},
        "batch_size": 8, "test_batch_size": 8, "num_epoch": 2,
    })
    cfg_dict.update(overrides)
    path = tmp_path / "ring.yaml"
    path.write_text(yaml.safe_dump(cfg_dict))
    return Trainer(load_config(["--config", str(path)]))


@pytest.mark.slow
def test_ring_trainer_launches_from_yaml_and_matches_dense(tmp_path):
    """The shipped synthetic_ring.yaml launches a ring-strategy Trainer
    whose loss trajectory equals the dense unsharded Trainer's."""
    data_path, label_path = _write_ring_dataset(tmp_path)

    tr_ring = _trainer_from_yaml(
        tmp_path, data_path, label_path, Experiment_name="ring")
    assert tr_ring.cfg.edge_strategy == "ring"
    ring_losses = [tr_ring.train_epoch(e)["loss"] for e in range(2)]
    acc_ring = tr_ring.evaluate(1)

    tr_dense = _trainer_from_yaml(
        tmp_path, data_path, label_path, Experiment_name="dense",
        edge_partition=False, edge_strategy="gather", mesh_shape=None)
    dense_losses = [tr_dense.train_epoch(e)["loss"] for e in range(2)]
    acc_dense = tr_dense.evaluate(1)

    np.testing.assert_allclose(ring_losses, dense_losses, atol=1e-4)
    assert acc_ring == acc_dense
    assert ring_losses[1] < ring_losses[0]  # it actually trains

    # resume roundtrip through the ring path
    path = tr_ring.save(1)
    assert path
    tr_resume = _trainer_from_yaml(
        tmp_path, data_path, label_path, Experiment_name="ring",
        resume="auto")
    assert tr_resume.start_epoch == 2


@pytest.mark.slow
def test_ring_rejected_for_skeleton_families_with_pointer(tmp_path):
    """stgcn + ring must fail with the message pointing at the ring_gnn
    family and the composition-boundary rationale."""
    from shift_gcn_tpu.train.config import ExperimentConfig
    from shift_gcn_tpu.train.trainer import Trainer

    data_path, label_path = _write_ring_dataset(tmp_path)
    cfg = ExperimentConfig(
        Experiment_name="bad_ring",
        work_dir=str(tmp_path / "w2"),
        model_saved_name=str(tmp_path / "s2"),
        model="shift_gcn_tpu.models.stgcn",
        model_args={"num_class": 2, "num_point": 25, "num_person": 1},
        train_feeder_args={"data_path": data_path,
                           "label_path": label_path},
        test_feeder_args={"data_path": data_path,
                          "label_path": label_path},
        batch_size=8, test_batch_size=8,
        mesh_shape=[1, 8], edge_partition=True, edge_strategy="ring",
    )
    with pytest.raises(ValueError, match="ring_gnn"):
        Trainer(cfg)
