"""Concurrent four-stream training (train/fourstream.py):
on-device modality derivation vs the numpy generators, vmapped-step parity
with independent single-stream training, and the trainer integration."""

import os
import pickle

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from shift_gcn_tpu.data import modalities
from shift_gcn_tpu.graphs import get_graph
from shift_gcn_tpu.models.shift_gcn import BlockSpec, ModelConfig
from shift_gcn_tpu.train import fourstream as fs
from shift_gcn_tpu.train.optim import build_weight_decay_tree
from shift_gcn_tpu.train.state import create_train_state, make_train_step


def _cfg():
    return ModelConfig(
        num_class=2, num_point=25, num_person=1, graph="ntu_rgb_d",
        blocks=(BlockSpec(3, 8, residual=False),
                BlockSpec(8, 16, stride=2)))


def test_device_modalities_match_numpy_generators():
    graph = get_graph("ntu_rgb_d")
    rng = np.random.default_rng(0)
    joint = rng.standard_normal((3, 3, 12, 25, 1)).astype(np.float32)
    want = modalities.derive_modalities(joint, graph)
    got = np.asarray(fs.derive_modalities_device(
        jnp.asarray(joint), graph.bone_parents()))
    for i, stream in enumerate(fs.STREAMS):
        np.testing.assert_allclose(got[i], want[stream], atol=1e-6,
                                   err_msg=stream)


def test_vmapped_step_matches_independent_streams():
    cfg = _cfg()
    graph = get_graph(cfg.graph)
    rng = np.random.default_rng(1)
    joint = jnp.asarray(rng.standard_normal((4, 3, 16, 25, 1)), jnp.float32)
    label = jnp.asarray(rng.integers(0, 2, 4), jnp.int32)
    lr = jnp.asarray(0.1, jnp.float32)

    state4 = fs.create_fourstream_state(jax.random.key(0), cfg)
    wd = build_weight_decay_tree(jax.tree_util.tree_map(
        lambda x: x[0], state4.params))
    step4 = jax.jit(fs.make_fourstream_train_step(cfg, wd, graph))
    new4, metrics4 = step4(state4, {"data": joint, "label": label}, lr)
    assert np.asarray(metrics4["loss"]).shape == (4,)

    # independent per-stream training over the same derived data
    keys = jax.random.split(jax.random.key(0), 4)
    data4 = np.asarray(fs.derive_modalities_device(
        joint, graph.bone_parents()))
    base = jax.jit(make_train_step(cfg, wd))
    for i, stream in enumerate(fs.STREAMS):
        si = create_train_state(keys[i], cfg)
        si2, mi = base(si, {"data": jnp.asarray(data4[i]),
                            "label": label}, lr)
        np.testing.assert_allclose(
            float(np.asarray(metrics4["loss"])[i]), float(mi["loss"]),
            atol=1e-6, err_msg=stream)
        got_i = jax.tree_util.tree_leaves(fs.unstack_stream(new4, i).params)
        want_i = jax.tree_util.tree_leaves(si2.params)
        for a, b in zip(got_i, want_i):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)


def test_stack_unstack_roundtrip():
    cfg = _cfg()
    state4 = fs.create_fourstream_state(jax.random.key(3), cfg)
    parts = [fs.unstack_stream(state4, i) for i in range(4)]
    back = fs.stack_streams(parts)
    for a, b in zip(jax.tree_util.tree_leaves(state4),
                    jax.tree_util.tree_leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_eval_step_ensembles_with_reference_alphas():
    cfg = _cfg()
    graph = get_graph(cfg.graph)
    rng = np.random.default_rng(4)
    state4 = fs.create_fourstream_state(jax.random.key(5), cfg)
    batch = {
        "data": jnp.asarray(rng.standard_normal((3, 3, 16, 25, 1)),
                            jnp.float32),
        "label": jnp.asarray(rng.integers(0, 2, 3), jnp.int32),
    }
    eval_step = jax.jit(fs.make_fourstream_eval_step(cfg, graph))
    logits4, ensemble, loss_sums, ns = eval_step(
        state4.params, state4.bn_state, batch)
    assert logits4.shape == (4, 3, 2)
    want = np.einsum("s,snk->nk", np.asarray(fs.ENSEMBLE_ALPHAS),
                     np.asarray(logits4))
    np.testing.assert_allclose(np.asarray(ensemble), want, atol=1e-5)
    assert np.asarray(ns).shape == (4,)


def test_trainer_fourstream_end_to_end(tmp_path):
    from shift_gcn_tpu.train.config import ExperimentConfig
    from shift_gcn_tpu.train.trainer import Trainer

    rng = np.random.default_rng(6)
    n, t = 12, 16
    data = rng.standard_normal((n, 3, t, 25, 1)).astype(np.float32)
    labels = rng.integers(0, 2, n).astype(np.int64)
    names = [f"clip{i}" for i in range(n)]
    np.save(tmp_path / "data.npy", data)
    with open(tmp_path / "label.pkl", "wb") as f:
        pickle.dump((names, labels.tolist()), f)

    cfg = ExperimentConfig(
        Experiment_name="fourstream_smoke",
        work_dir=str(tmp_path / "work"),
        model_saved_name=str(tmp_path / "save"),
        fourstream=True,
        train_feeder_args={"data_path": str(tmp_path / "data.npy"),
                           "label_path": str(tmp_path / "label.pkl")},
        test_feeder_args={"data_path": str(tmp_path / "data.npy"),
                          "label_path": str(tmp_path / "label.pkl")},
        model_args={"num_class": 2, "num_point": 25, "num_person": 1,
                    "graph": "ntu_rgb_d",
                    "blocks": [[3, 8, 1, False], [8, 16, 2]]},
        batch_size=8, test_batch_size=8, num_epoch=1,
        save_interval=1, eval_interval=1, device_guard=False)
    trainer = Trainer(cfg)
    best = trainer.start()
    assert 0.0 <= best <= 1.0
    eval_dir = os.path.join(trainer.work_dir, "eval_results")
    files = os.listdir(eval_dir)
    assert "best_acc.pkl" in files
    for stream in fs.STREAMS:
        assert f"best_acc_{stream}.pkl" in files, files
    # per-stream scores load as {sample_name: score}
    with open(os.path.join(eval_dir, "best_acc_bone.pkl"), "rb") as f:
        d = pickle.load(f)
    assert set(d) == set(names)

    # the saved stacked checkpoint drives the inference ensemble directly
    from shift_gcn_tpu.inference.pipeline import EnsemblePredictor

    predictor = EnsemblePredictor.from_fourstream_checkpoint(
        trainer.save_dir, model_config=trainer.model_config)
    probs = predictor.predict(data[:2])
    assert probs.shape == (2, 2)
    np.testing.assert_allclose(probs.sum(axis=-1), 1.0, atol=1e-5)

    # resume from the stacked checkpoint (regression: global_step is a
    # stacked (4,) array and must not break the resume logging)
    import dataclasses as dc

    cfg_resume = dc.replace(cfg, resume="auto", num_epoch=2)
    trainer2 = Trainer(cfg_resume)
    assert trainer2.start_epoch == 1
    step_no = int(np.asarray(trainer2.state.global_step).reshape(-1)[0])
    assert step_no > 0


def test_scan_mode_matches_vmap_mode():
    # "scan" (sequential lax.map, single-stream memory) and "vmap" are the
    # same math over the same per-stream step; outputs must agree
    cfg = _cfg()
    graph = get_graph(cfg.graph)
    rng = np.random.default_rng(5)
    joint = jnp.asarray(rng.standard_normal((4, 3, 16, 25, 1)), jnp.float32)
    label = jnp.asarray(rng.integers(0, 2, 4), jnp.int32)
    lr = jnp.asarray(0.1, jnp.float32)
    state4 = fs.create_fourstream_state(jax.random.key(2), cfg)
    wd = build_weight_decay_tree(jax.tree_util.tree_map(
        lambda x: x[0], state4.params))
    batch = {"data": joint, "label": label}
    s_scan, m_scan = jax.jit(
        fs.make_fourstream_train_step(cfg, wd, graph, mode="scan"))(
            state4, batch, lr)
    s_vmap, m_vmap = jax.jit(
        fs.make_fourstream_train_step(cfg, wd, graph, mode="vmap"))(
            state4, batch, lr)
    np.testing.assert_allclose(np.asarray(m_scan["loss"]),
                               np.asarray(m_vmap["loss"]), atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s_scan.params),
                    jax.tree_util.tree_leaves(s_vmap.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
