"""bench.py mode smoke tests: every mode must run on CPU (--smoke forces
the cpu platform + 8 virtual devices) and print one parseable JSON line
with the driver-contract keys."""

import json
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_bench(*extra):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # bench --smoke sets its own device count
    out = subprocess.run(
        [sys.executable, "bench.py", "--smoke", *extra],
        cwd=ROOT, env=env, capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    assert lines, out.stdout
    return json.loads(lines[-1])


@pytest.mark.slow
def test_train_mode_contract():
    rec = _run_bench()
    assert rec["metric"] == "train_clips_per_sec"
    assert rec["value"] > 0 and rec["unit"] == "clips/s"
    assert set(rec["roofline"]) == {
        "model_gflops_per_clip", "mfu", "hbm_gb_per_step_lower_bound",
        "bandwidth_util"}
    assert 0 <= rec["roofline"]["mfu"] <= 1
    # the MediaPipe workload HAS a published reference number (47 clips/s)
    # so vs_baseline must be a real ratio with its source named
    assert rec["vs_baseline"] is not None and rec["vs_baseline"] > 0
    assert "BASELINE.md" in rec["baseline_source"]
    # the default run carries BOTH halves of the headline: a nested eval
    # record with its own baseline ratio + roofline (VERDICT r4 task 3)
    ev = rec["eval"]
    assert ev["metric"] == "eval_clips_per_sec"
    assert ev["value"] > 0 and ev["unit"] == "clips/s"
    assert ev["vs_baseline"] is not None and ev["vs_baseline"] > 0
    assert "473" in ev["baseline_source"]
    assert ev["window_reps"]
    assert 0 <= ev["roofline"]["mfu"] <= 1


@pytest.mark.slow
def test_train_ntu_baseline_is_null_not_zero():
    """The fork publishes no NTU-mode throughput: the JSON must say
    vs_baseline null + baseline_source "unpublished", never 0 (which reads
    as "measured 0x") and never a ratio against the MediaPipe number
    (VERDICT r3 weak item 5)."""
    rec = _run_bench("--dataset", "ntu")
    assert rec["metric"] == "train_clips_per_sec"
    assert rec["dataset"] == "ntu"
    assert rec["value"] > 0
    assert rec["vs_baseline"] is None
    assert rec["baseline_source"] == "unpublished"
    # same semantics for the nested eval half
    assert rec["eval"]["vs_baseline"] is None
    assert rec["eval"]["baseline_source"] == "unpublished"


@pytest.mark.slow
def test_scaling_mode_runs_on_virtual_mesh():
    rec = _run_bench("--mode", "scaling", "--steps", "3")
    assert rec["metric"].startswith("dp_scaling_efficiency")
    assert rec["value"] > 0
    # virtual CPU devices must label themselves a harness smoke, never a
    # scaling measurement (VERDICT r2 weak item 4)
    assert rec["substrate"] == "virtual-cpu"
    assert rec["harness_smoke"] is True
    assert "1" in rec["clips_per_sec"]


@pytest.mark.slow
def test_scaling_devices_cap():
    rec = _run_bench("--mode", "scaling", "--steps", "3", "--devices", "2")
    assert rec["metric"] == "dp_scaling_efficiency_2x"
    assert set(rec["clips_per_sec"]) == {"1", "2"}


@pytest.mark.slow
@pytest.mark.parametrize("strategy", ["gather", "ring"])
def test_edges_mode_reports_scaling(strategy):
    rec = _run_bench("--mode", "edges", "--steps", "4",
                     "--strategy", strategy)
    assert rec["metric"].startswith("edge_scaling_efficiency")
    assert rec["strategy"] == strategy
    assert rec["value"] > 0
    assert "1" in rec["edges_per_sec"]
    assert rec["substrate"] == "virtual-cpu"
    assert rec["harness_smoke"] is True


@pytest.mark.slow
def test_io_mode_reports_loader_throughput():
    rec = _run_bench("--mode", "io")
    assert rec["metric"] == "io_clips_per_sec"
    assert rec["value"] > 0
    assert rec["numpy_mmap"] > 0
    # the native loader builds in this environment (test_native_loader
    # proves it), so a None here is a loader regression, not an
    # environment limitation
    assert rec["native_gather"] is not None and rec["native_gather"] > 0
    assert (rec["native_prefetch"] is not None
            and rec["native_prefetch"] > 0)


@pytest.mark.slow
def test_serve_mode_roundtrips_artifact():
    rec = _run_bench("--mode", "serve")
    assert rec["metric"] == "serve_clips_per_sec"
    assert rec["value"] > 0
    assert rec["flavor"] == "params-as-inputs"
    assert rec["artifact_bytes"]["inputs"] > 0
    assert rec["artifact_bytes"]["baked"] > rec["artifact_bytes"]["inputs"]
    assert rec["baked_clips_per_sec"] > 0
    assert rec["sync_batch_latency_ms"]["p50"] > 0
    # the deserialized artifact is the same XLA program as live jit
    assert rec["live_jit_clips_per_sec"] > 0
