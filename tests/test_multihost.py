"""Multi-host execution: the real Trainer driven as a 2-process CPU
jax.distributed job (VERDICT r3 task 2 / weak item 1).

Two child processes (tests/mh_driver.py) each own 4 virtual CPU devices
and initialize against a local TCP coordinator — an 8-device global mesh
with cross-process collectives.  The children run the REAL Trainer end to
end on smoke data: host-sharded feeders, global-batch assembly
(jax.make_array_from_process_local_data in parallel/mesh.shard_batch),
the jitted DP train step with cross-process grad/BN reductions, the
gathered eval pass, and Orbax checkpointing.

Asserted here:
- both processes see 2 procs / 8 global devices and agree bit-for-bit on
  every per-epoch loss and on the final accuracy (the metrics are global,
  replicated values),
- the per-host feeder shards are disjoint and exhaustive,
- the loss trajectory EQUALS a single-process 8-device run fed the same
  composed global batches (concat of the two host shards per step),
- exactly one process (the Orbax primary, process 0) wrote checkpoint
  files, and the checkpoint restores into a single-process Trainer
  template with the exact final parameters.
"""

import json
import os
import pickle
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_N_TRAIN = 64
_N_VAL = 61          # deliberately indivisible by hosts AND batch: the
                     # gathered eval must still score every sample once
_BATCH_PER_HOST = 4
_T_SEQPAR = 80       # 8 time shards x 10 local frames (>= max_shift + 1)
_EPOCHS = 2
_BASE_LR = 0.05
_BLOCKS = [[3, 8, 1, False], [8, 16, 2, True]]
_MODEL_ARGS = {"num_class": 2, "num_point": 25, "num_person": 1,
               "graph": "ntu_rgb_d", "blocks": _BLOCKS}


def _write_dataset(tmp_path, prefix="train", n=_N_TRAIN, t=16, v=25, m=1,
                   seed=3):
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, 2, n)
    data = rng.standard_normal((n, 3, t, v, m)).astype(np.float32) * 0.1
    drift = np.linspace(0, 1, t)[:, None, None]
    for i in range(n):
        if labels[i] == 1:
            data[i, 1] += drift
    names = [f"{prefix}{i}.skeleton" for i in range(n)]
    np.save(tmp_path / f"{prefix}_data.npy", data)
    with open(tmp_path / f"{prefix}_label.pkl", "wb") as f:
        pickle.dump((names, labels.tolist()), f)
    return (str(tmp_path / f"{prefix}_data.npy"),
            str(tmp_path / f"{prefix}_label.pkl"))


def _write_config(tmp_path, data_path, label_path, val_data, val_label,
                  **overrides):
    import yaml

    cfg = {
        "Experiment_name": "mh",
        "work_dir": str(tmp_path / "work"),
        "model_saved_name": str(tmp_path / "save"),
        "train_feeder_args": {"data_path": data_path,
                              "label_path": label_path},
        "test_feeder_args": {"data_path": val_data,
                             "label_path": val_label},
        "model_args": _MODEL_ARGS,
        "batch_size": _BATCH_PER_HOST,
        "test_batch_size": _BATCH_PER_HOST,
        "base_lr": _BASE_LR,
        "step": [100],
        "num_epoch": _EPOCHS,
        "nesterov": True,
        "device_guard": False,
        "print_log": False,
    }
    cfg.update(overrides)
    path = tmp_path / "mh.yaml"
    path.write_text(yaml.safe_dump(cfg))
    return str(path)


def _launch_pair(tmp_path, cfg_path, extra_env=None):
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()

    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(extra_env or {})
        env.pop("JAX_PLATFORMS", None)
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
        env["SGT_MH_PID"] = str(pid)
        env["SGT_MH_NPROC"] = "2"
        env["SGT_MH_COORD"] = f"127.0.0.1:{port}"
        env["SGT_MH_CONFIG"] = cfg_path
        # CLAUDE.md invariant: never set PYTHONPATH without the platform
        # sitecustomize dir (harmless here — the children pin CPU — but
        # subprocess launches must not become a template that drops it)
        parts = [ROOT]
        if os.path.isdir("/root/.axon_site"):
            parts.append("/root/.axon_site")
        if env.get("PYTHONPATH"):
            parts.append(env["PYTHONPATH"])
        env["PYTHONPATH"] = os.pathsep.join(parts)
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(ROOT, "tests", "mh_driver.py")],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True))
    results = {}
    logs = {}
    for pid, p in enumerate(procs):
        out, _ = p.communicate(timeout=900)
        logs[pid] = out
        assert p.returncode == 0, f"child {pid} failed:\n{out[-4000:]}"
        line = [ln for ln in out.splitlines()
                if ln.startswith("MHRESULT ")]
        assert line, out[-4000:]
        results[pid] = json.loads(line[-1][len("MHRESULT "):])
    return tmp_path, cfg_path, results, logs


@pytest.fixture(scope="module")
def mh_run(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("mh")
    data_path, label_path = _write_dataset(tmp_path)
    val_data, val_label = _write_dataset(tmp_path, prefix="val",
                                         n=_N_VAL, seed=9)
    cfg_path = _write_config(tmp_path, data_path, label_path,
                             val_data, val_label)
    return _launch_pair(tmp_path, cfg_path)


@pytest.fixture(scope="module")
def mh_tp_run(tmp_path_factory):
    """Pure tensor parallelism on a [1, 8] mesh: the 'model' axis spans
    BOTH processes (TP param shards + their matmul collectives cross the
    process boundary); batches are replicated (unsharded same-seed
    feeders on every host)."""
    tmp_path = tmp_path_factory.mktemp("mh_tp")
    data_path, label_path = _write_dataset(tmp_path)
    val_data, val_label = _write_dataset(tmp_path, prefix="val",
                                         n=_N_VAL, seed=9)
    cfg_path = _write_config(tmp_path, data_path, label_path,
                             val_data, val_label, mesh_shape=[1, 8])
    return _launch_pair(tmp_path, cfg_path)


@pytest.fixture(scope="module")
def mh_dptp_run(tmp_path_factory):
    """The realistic pod layout: DP across hosts x TP within them on a
    [2, 4] mesh — host-sharded feeders compose with TP-sharded params
    and the gathered eval."""
    tmp_path = tmp_path_factory.mktemp("mh_dptp")
    data_path, label_path = _write_dataset(tmp_path)
    val_data, val_label = _write_dataset(tmp_path, prefix="val",
                                         n=_N_VAL, seed=9)
    cfg_path = _write_config(tmp_path, data_path, label_path,
                             val_data, val_label, mesh_shape=[2, 4])
    return _launch_pair(tmp_path, cfg_path)


def _write_stgcn_dataset(tmp_path, prefix="train", n=_N_TRAIN, t=16,
                         seed=3):
    # V=33 mediapipe shape for the stgcn family
    return _write_dataset(tmp_path, prefix=prefix, n=n, t=t, v=33,
                          seed=seed)


@pytest.fixture(scope="module")
def mh_edges_run(tmp_path_factory):
    """Edge-partitioned ST-GCN training (the north-star mode) across
    2 processes: COO edge shards on the 'model' axis, batch crossing
    the process boundary on 'data' ([2, 4] mesh)."""
    tmp_path = tmp_path_factory.mktemp("mh_edges")
    data_path, label_path = _write_stgcn_dataset(tmp_path)
    val_data, val_label = _write_stgcn_dataset(tmp_path, prefix="val",
                                               n=_N_VAL, seed=9)
    cfg_path = _write_config(
        tmp_path, data_path, label_path, val_data, val_label,
        model="stgcn",
        model_args={"num_class": 2, "num_point": 33, "num_person": 1,
                    "graph": "mediapipe_pose"},
        mesh_shape=[2, 4], edge_partition=True, edge_strategy="gather")
    return _launch_pair(tmp_path, cfg_path)


_RING_V, _RING_C = 64, 8


def _write_ring_dataset(tmp_path, prefix="train", n=_N_TRAIN, seed=3):
    """(N, C, 1, V, 1) node-feature frames for the ring_gnn family:
    class 1 lifts channel 0 on a fixed node subset."""
    rng = np.random.default_rng(seed)
    lift = np.random.default_rng(99).choice(_RING_V, _RING_V // 4,
                                            replace=False)
    labels = rng.integers(0, 2, n)
    data = rng.standard_normal(
        (n, _RING_C, 1, _RING_V, 1)).astype(np.float32) * 0.3
    for i in range(n):
        if labels[i] == 1:
            data[i, 0, 0, lift, 0] += 0.8
    names = [f"{prefix}{i}.node" for i in range(n)]
    np.save(tmp_path / f"{prefix}_data.npy", data)
    with open(tmp_path / f"{prefix}_label.pkl", "wb") as f:
        pickle.dump((names, labels.tolist()), f)
    return (str(tmp_path / f"{prefix}_data.npy"),
            str(tmp_path / f"{prefix}_label.pkl"))


@pytest.fixture(scope="module")
def mh_ring_run(tmp_path_factory):
    """Ring-strategy node-sharded training across 2 processes on a
    [1, 8] mesh: the node axis spans both processes, so every ring
    `ppermute` that rotates the node blocks crosses the boundary."""
    tmp_path = tmp_path_factory.mktemp("mh_ring")
    data_path, label_path = _write_ring_dataset(tmp_path)
    val_data, val_label = _write_ring_dataset(tmp_path, prefix="val",
                                              n=_N_VAL, seed=9)
    cfg_path = _write_config(
        tmp_path, data_path, label_path, val_data, val_label,
        model="shift_gcn_tpu.models.ring_gnn",
        model_args={"num_class": 2, "num_nodes": _RING_V,
                    "in_channels": _RING_C, "hidden": [16]},
        mesh_shape=[1, 8], edge_partition=True, edge_strategy="ring")
    return _launch_pair(tmp_path, cfg_path)


@pytest.fixture(scope="module")
def mh_fourstream_run(tmp_path_factory):
    """Concurrent four-stream training across 2 processes (DP over the
    default [8,1] mesh): stacked-stream state replicated, per-host
    feeder shards composed into global batches, and the four-stream
    gathered eval restoring dataset order."""
    tmp_path = tmp_path_factory.mktemp("mh_fs")
    data_path, label_path = _write_dataset(tmp_path, v=33)
    val_data, val_label = _write_dataset(tmp_path, prefix="val",
                                         n=_N_VAL, v=33, seed=9)
    cfg_path = _write_config(
        tmp_path, data_path, label_path, val_data, val_label,
        model_args={"num_class": 2, "num_point": 33, "num_person": 1,
                    "graph": "mediapipe_pose", "blocks": _BLOCKS},
        fourstream=True)
    return _launch_pair(tmp_path, cfg_path)


@pytest.fixture(scope="module")
def mh_seqpar_run(tmp_path_factory):
    """Sequence parallelism on a [1, 8] mesh: the time axis spans both
    processes, so every halo-exchange ppermute in the temporal shifts
    crosses the process boundary through gloo."""
    tmp_path = tmp_path_factory.mktemp("mh_sp")
    data_path, label_path = _write_dataset(tmp_path, t=_T_SEQPAR)
    val_data, val_label = _write_dataset(tmp_path, prefix="val",
                                         n=_N_VAL, t=_T_SEQPAR, seed=9)
    cfg_path = _write_config(tmp_path, data_path, label_path,
                             val_data, val_label, mesh_shape=[1, 8],
                             shard_time=True)
    return _launch_pair(tmp_path, cfg_path)


@pytest.mark.slow
def test_two_processes_agree_on_global_metrics(mh_run):
    _, _, results, _ = mh_run
    r0, r1 = results[0], results[1]
    assert r0["proc_count"] == r1["proc_count"] == 2
    assert r0["global_devices"] == r1["global_devices"] == 8
    assert r0["local_devices"] == r1["local_devices"] == 4
    # loss/acc are global replicated values — identical on both hosts
    np.testing.assert_array_equal(r0["losses"], r1["losses"])
    assert r0["acc"] == r1["acc"]
    assert 0.0 <= r0["acc"] <= 1.0
    np.testing.assert_array_equal(r0["ypos"], r1["ypos"])
    # every val sample scored exactly once despite 61 % 2 != 0 and
    # 61 % 8 != 0 (ceil host quota + fully-padded lockstep batches)
    assert r0["eval_scores"] == r1["eval_scores"] == _N_VAL


@pytest.mark.slow
def test_host_shards_disjoint_and_exhaustive(mh_run):
    _, _, results, _ = mh_run
    s0, s1 = set(results[0]["shard"]), set(results[1]["shard"])
    assert not (s0 & s1)
    assert s0 | s1 == set(range(_N_TRAIN))


@pytest.mark.slow
def test_single_coherent_checkpoint_set(mh_run):
    """Both processes participate in the Orbax save (its multihost
    barriers require it; the primary host writes) into ONE shared
    directory: the result is a single coherent checkpoint per epoch, not
    two conflicting writes."""
    _, _, results, _ = mh_run
    assert results[0]["save_dir"] == results[1]["save_dir"]
    assert results[0]["ckpts"] == results[1]["ckpts"]
    assert set(results[0]["ckpts"]) == {str(e) for e in range(_EPOCHS)}


@pytest.mark.slow
def test_trajectory_matches_single_process_on_same_batches(mh_run):
    """The 2-process run computes exactly the single-process 8-device
    math: feed a single-process trainer the same composed global batches
    (concat of the two host shards per step) and compare the per-epoch
    mean losses and final positions."""
    _, _, results, _ = mh_run

    from shift_gcn_tpu.data.feeder import BatchIterator, Feeder
    from shift_gcn_tpu.models.registry import get_model
    from shift_gcn_tpu.parallel import mesh as mesh_lib
    from shift_gcn_tpu.train import state as state_lib
    from shift_gcn_tpu.train.optim import (build_weight_decay_tree,
                                           step_decay_lr)
    from shift_gcn_tpu.train.config import load_config

    cfg = load_config(["--config", mh_run[1]])
    family = get_model(cfg.model)
    model_config = family.build_config(cfg.model_args)
    state = state_lib.create_train_state(
        jax.random.key(cfg.seed), model_config, init_fn=family.init)
    wd_tree = build_weight_decay_tree(state.params)
    step_fn = jax.jit(state_lib.make_train_step(
        model_config, wd_tree, apply_fn=family.apply))
    mesh = mesh_lib.make_mesh(None)

    feeder = Feeder(**cfg.train_feeder_args)
    its = [BatchIterator(feeder, _BATCH_PER_HOST, shuffle=True,
                         drop_last=True, seed=cfg.seed, host_id=h,
                         num_hosts=2) for h in range(2)]
    epoch_losses = []
    for epoch in range(_EPOCHS):
        lr = jnp.asarray(step_decay_lr(epoch, cfg.base_lr, cfg.step, 0),
                         jnp.float32)
        losses = []
        for (d0, l0, _, _), (d1, l1, _, _) in zip(
                its[0].epoch(epoch), its[1].epoch(epoch)):
            batch = mesh_lib.shard_batch(mesh, {
                "data": np.concatenate([d0, d1]).astype(np.float32),
                "label": np.concatenate([l0, l1]),
            })
            state, metrics = step_fn(state, batch, lr)
            losses.append(float(metrics["loss"]))
        epoch_losses.append(float(np.mean(losses)))

    got = np.asarray(results[0]["losses"])
    want = np.asarray(epoch_losses)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-5)
    # final shift positions: quantized updates — match to fp roundoff
    ypos = np.asarray(
        state.params["l1"]["tcn1"]["shift_in"]["ypos"])
    np.testing.assert_allclose(
        np.asarray(results[0]["ypos"]), ypos, atol=1e-5)


def _unsharded_control_losses(cfg_path, epochs=_EPOCHS):
    """Per-epoch mean losses + final ypos from a PLAIN single-process jit
    (no mesh) driven by the same full batches the replicated-batch
    multi-process runs feed every host."""
    from shift_gcn_tpu.data.feeder import BatchIterator, Feeder
    from shift_gcn_tpu.models.registry import get_model
    from shift_gcn_tpu.train import state as state_lib
    from shift_gcn_tpu.train.config import load_config
    from shift_gcn_tpu.train.optim import (build_weight_decay_tree,
                                           step_decay_lr)

    cfg = load_config(["--config", cfg_path])
    family = get_model(cfg.model)
    model_config = family.build_config(cfg.model_args)
    state = state_lib.create_train_state(
        jax.random.key(cfg.seed), model_config, init_fn=family.init)
    wd_tree = build_weight_decay_tree(state.params)
    step_fn = jax.jit(state_lib.make_train_step(
        model_config, wd_tree, apply_fn=family.apply))

    feeder = Feeder(**cfg.train_feeder_args)
    it = BatchIterator(feeder, cfg.batch_size, shuffle=True,
                       drop_last=True, seed=cfg.seed, host_id=0,
                       num_hosts=1)
    epoch_losses = []
    for epoch in range(epochs):
        lr = jnp.asarray(step_decay_lr(epoch, cfg.base_lr, cfg.step, 0),
                         jnp.float32)
        losses = []
        for data, label, _, _ in it.epoch(epoch):
            state, metrics = step_fn(state, {
                "data": jnp.asarray(data, jnp.float32),
                "label": jnp.asarray(label)}, lr)
            losses.append(float(metrics["loss"]))
        epoch_losses.append(float(np.mean(losses)))
    ypos = np.asarray(state.params["l1"]["tcn1"]["shift_in"]["ypos"])
    return epoch_losses, ypos


@pytest.mark.slow
def test_tp_model_axis_spans_processes(mh_tp_run):
    """Cross-process tensor parallelism executes: on the [1, 8] mesh the
    TP param shards live across BOTH processes (4 addressable of 8), the
    metrics agree bit-for-bit between processes, and every process
    scores the full val set (replicated-batch mode)."""
    _, _, results, _ = mh_tp_run
    r0, r1 = results[0], results[1]
    assert r0["proc_count"] == r1["proc_count"] == 2
    assert r0["global_devices"] == 8 and r0["local_devices"] == 4
    for r in (r0, r1):
        # l1.gcn1.Linear_weight is (3, 8) sharded over all 8 devices on
        # its output axis: 8-device span, 4 addressable shards of (3, 1)
        # per process — the param genuinely crosses the boundary
        assert r["linear_weight_devices"] == 8
        assert r["linear_weight_addressable_shards"] == 4
        assert r["linear_weight_shard_rows"] == [3, 1]
        # unsharded same-seed feeders: both processes see the FULL set
        assert set(r["shard"]) == set(range(_N_TRAIN))
        assert r["eval_scores"] == _N_VAL
    np.testing.assert_array_equal(r0["losses"], r1["losses"])
    assert r0["acc"] == r1["acc"]
    np.testing.assert_array_equal(r0["ypos"], r1["ypos"])
    np.testing.assert_allclose(r0["checksum"], r1["checksum"], rtol=1e-6)


@pytest.mark.slow
def test_tp_trajectory_matches_unsharded(mh_tp_run):
    """The 2-process TP run computes the same training as a plain
    single-process jit on the identical batches.  The partitioned
    program's reduction order differs from the unsharded one, so the
    constraint update's sign ties resample the ±0.01·lr dither path
    after the first epoch (the PARITY.md finding: long-horizon bitwise
    lockstep across reduction orders is ill-posed by construction) —
    epoch 1 must match at fp roundoff, later epochs within the dither
    envelope."""
    _, cfg_path, results, _ = mh_tp_run
    losses, ypos = _unsharded_control_losses(cfg_path)
    got = np.asarray(results[0]["losses"])
    np.testing.assert_allclose(got[0], losses[0], atol=1e-4)
    np.testing.assert_allclose(got, losses, atol=2e-3)
    # every position within a few dither quanta (0.01 * lr = 5e-4/step)
    np.testing.assert_allclose(results[0]["ypos"], ypos, atol=0.02)


@pytest.mark.slow
def test_tp_checkpoints_coherent(mh_tp_run):
    """Orbax writes ONE coherent checkpoint set per epoch even though the
    saved params are sharded across both processes."""
    _, _, results, _ = mh_tp_run
    assert results[0]["save_dir"] == results[1]["save_dir"]
    assert results[0]["ckpts"] == results[1]["ckpts"]
    assert set(results[0]["ckpts"]) == {str(e) for e in range(_EPOCHS)}


@pytest.mark.slow
def test_tp_checkpoint_restores_across_topologies(mh_tp_run):
    """A checkpoint written by the 2-process TP run (params sharded
    across both processes at save time) restores into a plain
    SINGLE-process template with the exact final parameters — sharded
    saves are topology-portable, the production resume/serve property."""
    _, cfg_path, results, _ = mh_tp_run
    from shift_gcn_tpu.models.registry import get_model
    from shift_gcn_tpu.train import state as state_lib
    from shift_gcn_tpu.train.config import load_config
    from shift_gcn_tpu.utils import checkpoint as ckpt_lib

    cfg = load_config(["--config", cfg_path])
    family = get_model(cfg.model)
    model_config = family.build_config(cfg.model_args)
    state = state_lib.create_train_state(
        jax.random.key(cfg.seed), model_config, init_fn=family.init)
    latest = ckpt_lib.latest_checkpoint(results[0]["save_dir"])
    assert latest is not None
    payload = ckpt_lib.restore_checkpoint(latest, {
        "params": state.params,
        "bn_state": state.bn_state,
        "opt_state": state.opt_state,
        "global_step": state.global_step,
        "meta": {"epoch": 0, "best_acc": 0.0},
    })
    checksum = float(sum(
        float(np.abs(np.asarray(leaf)).sum())
        for leaf in jax.tree_util.tree_leaves(payload["params"])))
    np.testing.assert_allclose(checksum, results[0]["checksum"],
                               rtol=1e-6)
    ypos = np.asarray(
        payload["params"]["l1"]["tcn1"]["shift_in"]["ypos"])
    np.testing.assert_allclose(np.asarray(results[0]["ypos"]), ypos,
                               atol=1e-7)
    assert int(payload["meta"]["epoch"]) == _EPOCHS - 1


@pytest.mark.slow
def test_dptp_composes_host_sharding_with_tp(mh_dptp_run):
    """DP across hosts x TP within them ([2, 4] mesh): host feeder
    shards stay disjoint+exhaustive, the TP param sharding spans the
    model axis, the gathered eval scores every sample once, and the
    trajectory equals the single-process composed-batch control."""
    _, cfg_path, results, _ = mh_dptp_run
    r0, r1 = results[0], results[1]
    assert r0["proc_count"] == 2 and r0["global_devices"] == 8
    np.testing.assert_array_equal(r0["losses"], r1["losses"])
    assert r0["acc"] == r1["acc"]
    # host shards disjoint + exhaustive (DP across processes)
    s0, s1 = set(r0["shard"]), set(r1["shard"])
    assert not (s0 & s1) and s0 | s1 == set(range(_N_TRAIN))
    assert r0["eval_scores"] == _N_VAL
    # TP really sharded: (3, 8) weight over the 4-wide model axis
    for r in (r0, r1):
        assert r["linear_weight_devices"] == 8
        assert r["linear_weight_shard_rows"] == [3, 2]
    # control: single-process 8-device [2,4] run on the same composed
    # global batches (concat of the two host shards per step)
    from shift_gcn_tpu.data.feeder import BatchIterator, Feeder
    from shift_gcn_tpu.models.registry import get_model
    from shift_gcn_tpu.parallel import mesh as mesh_lib
    from shift_gcn_tpu.train import state as state_lib
    from shift_gcn_tpu.train.config import load_config
    from shift_gcn_tpu.train.optim import (build_weight_decay_tree,
                                           step_decay_lr)

    cfg = load_config(["--config", cfg_path])
    family = get_model(cfg.model)
    model_config = family.build_config(cfg.model_args)
    state = state_lib.create_train_state(
        jax.random.key(cfg.seed), model_config, init_fn=family.init)
    wd_tree = build_weight_decay_tree(state.params)
    step_fn = jax.jit(state_lib.make_train_step(
        model_config, wd_tree, apply_fn=family.apply))
    mesh = mesh_lib.make_mesh([2, 4])
    state = jax.device_put(state,
                           mesh_lib.state_shardings(mesh, state))
    feeder = Feeder(**cfg.train_feeder_args)
    its = [BatchIterator(feeder, _BATCH_PER_HOST, shuffle=True,
                         drop_last=True, seed=cfg.seed, host_id=h,
                         num_hosts=2) for h in range(2)]
    epoch_losses = []
    for epoch in range(_EPOCHS):
        lr = jnp.asarray(step_decay_lr(epoch, cfg.base_lr, cfg.step, 0),
                         jnp.float32)
        losses = []
        for (d0, l0, _, _), (d1, l1, _, _) in zip(
                its[0].epoch(epoch), its[1].epoch(epoch)):
            batch = mesh_lib.shard_batch(mesh, {
                "data": np.concatenate([d0, d1]).astype(np.float32),
                "label": np.concatenate([l0, l1]),
            })
            state, metrics = step_fn(state, batch, lr)
            losses.append(float(metrics["loss"]))
        epoch_losses.append(float(np.mean(losses)))
    # same epoch-1-exact / dither-envelope structure as the other modes
    got = np.asarray(r0["losses"])
    np.testing.assert_allclose(got[0], epoch_losses[0], atol=1e-4)
    np.testing.assert_allclose(got, epoch_losses, atol=2e-3)
    ypos = np.asarray(state.params["l1"]["tcn1"]["shift_in"]["ypos"])
    np.testing.assert_allclose(r0["ypos"], ypos, atol=0.02)


@pytest.mark.slow
def test_edge_partition_crosses_processes(mh_edges_run):
    """The north-star edge-partitioned mode executes across processes:
    COO edge shards on the within-process 'model' axis, batch crossing
    the boundary on 'data'; metrics bit-equal between processes, host
    shards disjoint+exhaustive, gathered eval exact, and the trajectory
    matches a single-process run of the SAME edge-sharded [2,4] program
    on the composed global batches."""
    _, cfg_path, results, _ = mh_edges_run
    r0, r1 = results[0], results[1]
    assert r0["proc_count"] == 2 and r0["global_devices"] == 8
    np.testing.assert_array_equal(r0["losses"], r1["losses"])
    assert r0["acc"] == r1["acc"]
    s0, s1 = set(r0["shard"]), set(r1["shard"])
    assert not (s0 & s1) and s0 | s1 == set(range(_N_TRAIN))
    assert r0["eval_scores"] == _N_VAL

    from shift_gcn_tpu.data.feeder import BatchIterator, Feeder
    from shift_gcn_tpu.models.registry import get_model
    from shift_gcn_tpu.parallel import edge_partition as ep
    from shift_gcn_tpu.parallel import mesh as mesh_lib
    from shift_gcn_tpu.train import state as state_lib
    from shift_gcn_tpu.train.config import load_config
    from shift_gcn_tpu.train.optim import (build_weight_decay_tree,
                                           step_decay_lr)

    cfg = load_config(["--config", cfg_path])
    family = get_model(cfg.model)
    model_config = family.build_config(cfg.model_args)
    state = state_lib.create_train_state(
        jax.random.key(cfg.seed), model_config, init_fn=family.init)
    wd_tree = build_weight_decay_tree(state.params)
    mesh = mesh_lib.make_mesh([2, 4])
    sharded_apply = ep.make_edge_sharded_apply(
        model_config, mesh, batch_axis="data", edge_axis="model",
        apply_fn=family.apply)
    step_fn = jax.jit(ep.make_edge_sharded_train_step(
        model_config, wd_tree, mesh, batch_axis="data",
        edge_axis="model", sharded_apply=sharded_apply))
    state = jax.device_put(state, mesh_lib.replicated(mesh))
    feeder = Feeder(**cfg.train_feeder_args)
    its = [BatchIterator(feeder, _BATCH_PER_HOST, shuffle=True,
                         drop_last=True, seed=cfg.seed, host_id=h,
                         num_hosts=2) for h in range(2)]
    epoch_losses = []
    for epoch in range(_EPOCHS):
        lr = jnp.asarray(step_decay_lr(epoch, cfg.base_lr, cfg.step, 0),
                         jnp.float32)
        losses = []
        for (d0, l0, _, _), (d1, l1, _, _) in zip(
                its[0].epoch(epoch), its[1].epoch(epoch)):
            batch = mesh_lib.shard_batch(mesh, {
                "data": np.concatenate([d0, d1]).astype(np.float32),
                "label": np.concatenate([l0, l1]),
            })
            state, metrics = step_fn(state, batch, lr)
            losses.append(float(metrics["loss"]))
        epoch_losses.append(float(np.mean(losses)))
    # no shift-constraint dither in the stgcn family: the trajectories
    # should track at fp tolerance
    np.testing.assert_allclose(r0["losses"], epoch_losses,
                               atol=1e-4, rtol=1e-4)
    checksum = float(sum(
        float(np.abs(np.asarray(leaf)).sum())
        for leaf in jax.tree_util.tree_leaves(state.params)))
    np.testing.assert_allclose(r0["checksum"], checksum, rtol=1e-5)


@pytest.mark.slow
def test_fourstream_crosses_processes(mh_fourstream_run):
    """The last formerly-guarded mode: concurrent four-stream training
    in 2 processes — metrics bit-equal across processes, gathered
    four-stream eval scores every sample once, and the trajectory
    equals the single-process fourstream step on the composed global
    batches (epoch-1 exact, then the constraint dither envelope)."""
    _, cfg_path, results, _ = mh_fourstream_run
    r0, r1 = results[0], results[1]
    assert r0["proc_count"] == 2 and r0["global_devices"] == 8
    np.testing.assert_array_equal(r0["losses"], r1["losses"])
    assert r0["acc"] == r1["acc"]
    s0, s1 = set(r0["shard"]), set(r1["shard"])
    assert not (s0 & s1) and s0 | s1 == set(range(_N_TRAIN))
    assert r0["eval_scores"] == _N_VAL

    from shift_gcn_tpu.data.feeder import BatchIterator, Feeder
    from shift_gcn_tpu.graphs import get_graph
    from shift_gcn_tpu.models.registry import get_model
    from shift_gcn_tpu.parallel import mesh as mesh_lib
    from shift_gcn_tpu.train import fourstream as fs
    from shift_gcn_tpu.train.config import load_config
    from shift_gcn_tpu.train.optim import (build_weight_decay_tree,
                                           step_decay_lr)

    cfg = load_config(["--config", cfg_path])
    family = get_model(cfg.model)
    model_config = family.build_config(cfg.model_args)
    state4 = fs.create_fourstream_state(
        jax.random.key(cfg.seed), model_config, init_fn=family.init)
    wd_tree = build_weight_decay_tree(
        jax.tree_util.tree_map(lambda x: x[0], state4.params))
    graph = get_graph(model_config.graph)
    step_fn = jax.jit(fs.make_fourstream_train_step(
        model_config, wd_tree, graph, apply_fn=family.apply))
    mesh = mesh_lib.make_mesh(None)
    feeder = Feeder(**cfg.train_feeder_args)
    its = [BatchIterator(feeder, _BATCH_PER_HOST, shuffle=True,
                         drop_last=True, seed=cfg.seed, host_id=h,
                         num_hosts=2) for h in range(2)]
    epoch_losses = []
    for epoch in range(_EPOCHS):
        lr = jnp.asarray(step_decay_lr(epoch, cfg.base_lr, cfg.step, 0),
                         jnp.float32)
        losses = []
        for (d0, l0, _, _), (d1, l1, _, _) in zip(
                its[0].epoch(epoch), its[1].epoch(epoch)):
            batch = mesh_lib.shard_batch(mesh, {
                "data": np.concatenate([d0, d1]).astype(np.float32),
                "label": np.concatenate([l0, l1]),
            })
            state4, metrics = step_fn(state4, batch, lr)
            losses.append(float(np.mean(np.asarray(metrics["loss"]))))
        epoch_losses.append(float(np.mean(losses)))
    got = np.asarray(r0["losses"])
    np.testing.assert_allclose(got[0], epoch_losses[0], atol=1e-4)
    np.testing.assert_allclose(got, epoch_losses, atol=2e-3)
    ypos = np.asarray(state4.params["l1"]["tcn1"]["shift_in"]["ypos"])
    np.testing.assert_allclose(np.asarray(r0["ypos"]), ypos, atol=0.02)


@pytest.mark.slow
def test_ring_node_shards_span_processes(mh_ring_run):
    """The large-graph story executed at its target deployment shape:
    node features sharded over a [1, 8] mesh whose axis spans both
    processes — every ring ppermute crosses the boundary through gloo.
    Metrics bit-equal between processes; trajectory equals the same
    ring-sharded program run single-process on the identical full
    batches."""
    _, cfg_path, results, _ = mh_ring_run
    r0, r1 = results[0], results[1]
    assert r0["proc_count"] == 2 and r0["global_devices"] == 8
    np.testing.assert_array_equal(r0["losses"], r1["losses"])
    assert r0["acc"] == r1["acc"]
    for r in (r0, r1):
        assert set(r["shard"]) == set(range(_N_TRAIN))  # replicated mode
        assert r["eval_scores"] == _N_VAL

    # control: the SAME ring-sharded [1,8] program, single process
    from shift_gcn_tpu.data.feeder import BatchIterator, Feeder
    from shift_gcn_tpu.models.registry import get_model
    from shift_gcn_tpu.parallel import edge_partition as ep
    from shift_gcn_tpu.parallel import mesh as mesh_lib
    from shift_gcn_tpu.train import state as state_lib
    from shift_gcn_tpu.train.config import load_config
    from shift_gcn_tpu.train.optim import (build_weight_decay_tree,
                                           step_decay_lr)
    from jax.sharding import PartitionSpec as P

    cfg = load_config(["--config", cfg_path])
    family = get_model(cfg.model)
    model_config = family.build_config(cfg.model_args)
    state = state_lib.create_train_state(
        jax.random.key(cfg.seed), model_config, init_fn=family.init)
    wd_tree = build_weight_decay_tree(state.params)
    mesh = mesh_lib.make_mesh([1, 8])
    sharded_apply = ep.make_ring_sharded_apply(
        model_config, mesh, batch_axis="data", edge_axis="model",
        apply_fn=family.apply)
    step_fn = jax.jit(ep.make_edge_sharded_train_step(
        model_config, wd_tree, mesh, batch_axis="data",
        edge_axis="model", sharded_apply=sharded_apply))
    state = jax.device_put(state, mesh_lib.replicated(mesh))
    specs = {"data": P("data", None, None, "model", None)}
    feeder = Feeder(**cfg.train_feeder_args)
    it = BatchIterator(feeder, cfg.batch_size, shuffle=True,
                       drop_last=True, seed=cfg.seed, host_id=0,
                       num_hosts=1)
    epoch_losses = []
    for epoch in range(_EPOCHS):
        lr = jnp.asarray(step_decay_lr(epoch, cfg.base_lr, cfg.step, 0),
                         jnp.float32)
        losses = []
        for data, label, _, _ in it.epoch(epoch):
            batch = mesh_lib.shard_batch(mesh, {
                "data": data.astype(np.float32),
                "label": label,
            }, specs=specs)
            state, metrics = step_fn(state, batch, lr)
            losses.append(float(metrics["loss"]))
        epoch_losses.append(float(np.mean(losses)))
    np.testing.assert_allclose(r0["losses"], epoch_losses,
                               atol=1e-4, rtol=1e-4)
    checksum = float(sum(
        float(np.abs(np.asarray(leaf)).sum())
        for leaf in jax.tree_util.tree_leaves(state.params)))
    np.testing.assert_allclose(r0["checksum"], checksum, rtol=1e-5)


@pytest.mark.slow
def test_seqpar_time_axis_spans_processes(mh_seqpar_run):
    """Cross-process sequence parallelism executes: T=80 sharded 8 ways
    over the [1, 8] mesh, so every temporal-shift halo ppermute crosses
    the process boundary; metrics agree bit-for-bit between processes
    and the trajectory equals the plain unsharded single-process run."""
    _, cfg_path, results, _ = mh_seqpar_run
    r0, r1 = results[0], results[1]
    assert r0["proc_count"] == 2 and r0["global_devices"] == 8
    np.testing.assert_array_equal(r0["losses"], r1["losses"])
    assert r0["acc"] == r1["acc"]
    np.testing.assert_array_equal(r0["ypos"], r1["ypos"])
    for r in (r0, r1):
        assert set(r["shard"]) == set(range(_N_TRAIN))
        assert r["eval_scores"] == _N_VAL
    # same epoch-1-exact / dither-envelope structure as the TP test
    # (the halo program's reduction order differs from the dense one)
    losses, ypos = _unsharded_control_losses(cfg_path)
    got = np.asarray(r0["losses"])
    np.testing.assert_allclose(got[0], losses[0], atol=1e-4)
    np.testing.assert_allclose(got, losses, atol=2e-3)
    np.testing.assert_allclose(r0["ypos"], ypos, atol=0.02)


@pytest.mark.slow
def test_resumed_past_end_final_eval_is_collective(mh_run):
    """Advisor r4: after a kill during the final eval, the per-process
    work dirs can DISAGREE on best_acc.pkl; the rerun's decision to
    re-enter the collective final eval must be made by process 0 and
    broadcast, or the process that enters evaluate() deadlocks in its
    cross-process gathers.  Simulate the worst case (process 0 lost its
    pickle, process 1 kept it) and rerun Trainer.start() with
    resume: auto — both processes must agree to evaluate, terminate,
    and regenerate the pickle."""
    import yaml

    tmp_path, cfg_path, _, _ = mh_run
    p0_best = (tmp_path / "work" / "p0" / "mh" / "eval_results"
               / "best_acc.pkl")
    # the driver's work_dir layout: work/p{pid}/<Experiment_name>
    assert p0_best.exists(), sorted(
        (tmp_path / "work").rglob("*.pkl"))
    p0_best.unlink()
    p1_best = (tmp_path / "work" / "p1" / "mh" / "eval_results"
               / "best_acc.pkl")
    assert p1_best.exists()

    with open(cfg_path) as f:
        cfg = yaml.safe_load(f)
    cfg["resume"] = "auto"
    rerun_path = tmp_path / "mh_resume.yaml"
    rerun_path.write_text(yaml.safe_dump(cfg))
    _, _, results, _ = _launch_pair(tmp_path, str(rerun_path),
                                    extra_env={"SGT_MH_START": "1"})
    # both children terminated (no deadlock), resumed past the end, and
    # the final eval ran collectively
    for r in results.values():
        assert r["start_epoch"] == _EPOCHS
        assert r["best_acc"] > 0
    assert p0_best.exists()


@pytest.mark.slow
def test_cli_manual_two_host_launch(tmp_path):
    """The documented manual multi-host launch works end to end through
    the REAL CLI: the same `python -m shift_gcn_tpu.cli.train` command
    on two "hosts" (JAX_COORDINATOR_ADDRESS + SGT_NUM_PROCESSES /
    SGT_PROCESS_ID, per-host --work-dir), full Trainer.start() with the
    2-process DP mesh, shared checkpoints, gathered eval."""
    data_path, label_path = _write_dataset(tmp_path)
    val_data, val_label = _write_dataset(tmp_path, prefix="val",
                                         n=_N_VAL, seed=9)
    cfg_path = _write_config(tmp_path, data_path, label_path,
                             val_data, val_label)
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()

    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env["SGT_PLATFORM"] = "cpu"
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
        env["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
        env["SGT_NUM_PROCESSES"] = "2"
        env["SGT_PROCESS_ID"] = str(pid)
        parts = [ROOT]
        if os.path.isdir("/root/.axon_site"):
            parts.append("/root/.axon_site")
        if env.get("PYTHONPATH"):
            parts.append(env["PYTHONPATH"])
        env["PYTHONPATH"] = os.pathsep.join(parts)
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "shift_gcn_tpu.cli.train",
             "--config", cfg_path,
             "--work-dir", str(tmp_path / "work" / f"p{pid}")],
            env=env, cwd=ROOT, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True))
    outs = {}
    for pid, p in enumerate(procs):
        out, _ = p.communicate(timeout=900)
        outs[pid] = out
        assert p.returncode == 0, f"host {pid} failed:\n{out[-4000:]}"
        assert "best accuracy:" in out, out[-2000:]
    # the two hosts printed the identical (global) best accuracy
    best = [ln for ln in outs[0].splitlines() if "best accuracy:" in ln]
    best1 = [ln for ln in outs[1].splitlines() if "best accuracy:" in ln]
    assert best[-1].split("best accuracy:")[1] == \
        best1[-1].split("best accuracy:")[1]
    # one shared coherent checkpoint set (start() saves on the
    # save_interval cadence — the final epoch is always present)
    save_dir = tmp_path / "save" / "mh"
    assert str(_EPOCHS - 1) in os.listdir(save_dir)


@pytest.mark.slow
def test_checkpoint_restores_final_state(mh_run):
    tmp_path, cfg_path, results, _ = mh_run
    from shift_gcn_tpu.models.registry import get_model
    from shift_gcn_tpu.train import state as state_lib
    from shift_gcn_tpu.train.config import load_config
    from shift_gcn_tpu.utils import checkpoint as ckpt_lib

    cfg = load_config(["--config", cfg_path])
    family = get_model(cfg.model)
    model_config = family.build_config(cfg.model_args)
    state = state_lib.create_train_state(
        jax.random.key(cfg.seed), model_config, init_fn=family.init)
    latest = ckpt_lib.latest_checkpoint(results[0]["save_dir"])
    assert latest is not None
    payload = ckpt_lib.restore_checkpoint(latest, {
        "params": state.params,
        "bn_state": state.bn_state,
        "opt_state": state.opt_state,
        "global_step": state.global_step,
        "meta": {"epoch": 0, "best_acc": 0.0},
    })
    checksum = float(sum(
        float(np.abs(np.asarray(leaf)).sum())
        for leaf in jax.tree_util.tree_leaves(payload["params"])))
    np.testing.assert_allclose(checksum, results[0]["checksum"],
                               rtol=1e-6)
    assert int(payload["meta"]["epoch"]) == _EPOCHS - 1
