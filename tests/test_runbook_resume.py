"""Accuracy-runbook re-entry (VERDICT r3 task 6): kill
scripts/reproduce_accuracy.sh after stream 1 finishes, rerun it, and
verify the finished stream SKIPS (auto-resume past its last epoch), the
data stages skip, and the rerun completes to the ensemble table.

Mirrors the unattended-interruption semantics the reference's resume flag
provides per run (main.py:215-229), lifted to the whole 4-stream chain.
"""

import os
import signal
import subprocess
import sys
import time

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# tiny 2-block model + small batch so both invocations stay CPU-cheap;
# '|'-delimited because --model_args carries a YAML dict with spaces
TINY_ARGS = "|".join([
    "--model_args",
    "{num_class: 2, num_point: 33, num_person: 1, graph: mediapipe_pose,"
    " blocks: [[3, 8, 1, 0], [8, 8, 1, 1]]}",
    "--batch_size", "8", "--test_batch_size", "8",
    "--activation_dtype", "float32",
])


def _env(tmp_path):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.update({
        "SGT_PLATFORM": "cpu",          # never touch the TPU from tests
        "DATA_DIR": str(tmp_path / "data"),
        "WORK_DIR": str(tmp_path / "work"),
        "EPOCHS": "2",
        "N_TRAIN": "16",
        "N_VAL": "16",
        "EXTRA_TRAIN_ARGS": TINY_ARGS,
    })
    return env


@pytest.mark.slow
def test_runbook_kill_after_stream1_then_rerun_resumes(tmp_path):
    env = _env(tmp_path)
    script = os.path.join(ROOT, "scripts", "reproduce_accuracy.sh")
    joint_final_ckpt = (tmp_path / "work" / "save_models"
                        / "mediapipe_ShiftGCN_joint" / "1")
    bone_log = (tmp_path / "work" / "mediapipe_ShiftGCN_bone" / "log.txt")

    # run 1: start the runbook, wait until stream 1 (joint) has saved its
    # final checkpoint AND stream 2 (bone) has started, then kill the
    # whole process group (exact pgid of the process we started)
    proc = subprocess.Popen(
        ["bash", script], cwd=ROOT, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        start_new_session=True)
    try:
        deadline = time.time() + 600
        while time.time() < deadline:
            if proc.poll() is not None:
                out = proc.stdout.read()
                raise AssertionError(
                    f"runbook exited before the kill point:\n{out[-3000:]}")
            if joint_final_ckpt.exists() and bone_log.exists():
                break
            time.sleep(2)
        else:
            raise AssertionError("joint checkpoint / bone start never "
                                 "appeared within 600s")
    finally:
        if proc.poll() is None:
            os.killpg(proc.pid, signal.SIGKILL)
        proc.stdout.close()
        proc.wait()

    assert joint_final_ckpt.exists()

    # run 2: plain rerun of the same command must (a) skip the data
    # stages, (b) auto-resume the finished joint stream past its last
    # epoch (no retraining), and (c) finish the chain to the table
    out = subprocess.run(
        ["bash", script], cwd=ROOT, env=env, capture_output=True,
        text=True, timeout=1200)
    assert out.returncode == 0, out.stdout[-3000:] + out.stderr[-2000:]
    assert "skipping gendata" in out.stdout
    assert "stage 2: modality artifacts already present" in out.stdout
    assert "metrics vs BASELINE.md" in out.stdout

    joint_log = (tmp_path / "work" / "mediapipe_ShiftGCN_joint"
                 / "log.txt").read_text()
    assert "Auto-resume found checkpoint" in joint_log
    # resumed start epoch == num_epoch -> zero epochs retrained
    assert "Resumed: epoch=2" in joint_log
    post_resume = joint_log.split("Auto-resume found checkpoint")[-1]
    assert "Training epoch:" not in post_resume

    # every stream produced its best-score pickle for the ensemble
    for stream in ("joint", "bone", "joint_motion", "bone_motion"):
        assert (tmp_path / "work" / f"mediapipe_ShiftGCN_{stream}"
                / "eval_results" / "best_acc.pkl").exists(), stream


@pytest.mark.slow
def test_resumed_past_end_run_still_writes_best_pickle(tmp_path):
    """The final-eval wedge (code-review r4): a kill AFTER the last
    checkpoint save but DURING the final eval leaves a run whose
    auto-resume skips every epoch — Trainer.start() must still produce
    eval_results/best_acc.pkl (re-evaluate, not retrain) or the ensemble
    stage crash-loops forever."""
    import pickle

    import numpy as np

    from shift_gcn_tpu.train.config import ExperimentConfig
    from shift_gcn_tpu.train.trainer import Trainer

    rng = np.random.default_rng(0)
    n = 16
    labels = rng.integers(0, 2, n)
    data = rng.standard_normal((n, 3, 16, 25, 1)).astype(np.float32)
    np.save(tmp_path / "data.npy", data)
    with open(tmp_path / "label.pkl", "wb") as f:
        pickle.dump(([f"s{i}" for i in range(n)], labels.tolist()), f)

    def make_cfg():
        return ExperimentConfig(
            Experiment_name="wedge",
            work_dir=str(tmp_path / "work"),
            model_saved_name=str(tmp_path / "save"),
            model_args={"num_class": 2, "num_point": 25, "num_person": 1,
                        "blocks": [[3, 8, 1, 0]]},
            train_feeder_args={"data_path": str(tmp_path / "data.npy"),
                               "label_path": str(tmp_path / "label.pkl")},
            test_feeder_args={"data_path": str(tmp_path / "data.npy"),
                              "label_path": str(tmp_path / "label.pkl")},
            batch_size=8, test_batch_size=8, num_epoch=1,
            eval_interval=1, save_interval=1, device_guard=False,
            resume="auto", print_log=False,
        )

    # simulate the wedge: train + save the final checkpoint, but "die"
    # before the final eval completes (no eval_results written)
    tr = Trainer(make_cfg())
    tr.train_epoch(0)
    tr.save(0)
    best_pkl = (tmp_path / "work" / "wedge" / "eval_results"
                / "best_acc.pkl")
    assert not best_pkl.exists()

    # plain rerun: auto-resume lands past the end; start() must
    # re-evaluate (zero retraining) and write the pickle
    tr2 = Trainer(make_cfg())
    assert tr2.start_epoch == 1  # nothing left to train
    tr2.start()
    assert best_pkl.exists()
