"""Device health guard (utils/device_guard.py)."""

import numpy as np
import pytest

from shift_gcn_tpu.utils import device_guard


class _Log:
    def __init__(self):
        self.lines = []

    def log(self, msg):
        self.lines.append(msg)


def test_device_healthy_on_cpu():
    # the forced-CPU test backend must always pass the numeric check
    assert device_guard.device_healthy()


def test_check_passes_without_sleeping():
    sleeps = []
    device_guard.check(healthy_fn=lambda: True,
                       sleep_fn=sleeps.append)
    assert sleeps == []


def test_check_retries_then_raises():
    sleeps = []
    log = _Log()
    with pytest.raises(device_guard.DeviceUnhealthyError):
        device_guard.check(max_tries=3, wait_s=7.0,
                           healthy_fn=lambda: False,
                           sleep_fn=sleeps.append, logger=log)
    assert sleeps == [7.0, 7.0, 7.0]
    assert len(log.lines) == 3


def test_check_recovers_mid_retry():
    state = {"n": 0}

    def flaky():
        state["n"] += 1
        return state["n"] >= 2

    sleeps = []
    device_guard.check(healthy_fn=flaky, sleep_fn=sleeps.append)
    assert len(sleeps) == 1


def test_plausible_throughput_threshold():
    assert device_guard.plausible_throughput(200.0)
    assert device_guard.plausible_throughput(2999.0)
    assert not device_guard.plausible_throughput(
        device_guard.MAX_PLAUSIBLE_CLIPS_PER_SEC + 1)


def test_reexec_depth_cap(monkeypatch):
    monkeypatch.setenv(device_guard._REEXEC_ENV,
                       str(device_guard._MAX_REEXEC))
    with pytest.raises(device_guard.DeviceUnhealthyError):
        device_guard.reexec_with_resume(wait_s=0.0)


def _capture_reexec(monkeypatch, argv):
    calls = {}

    def fake_execve(path, new_argv, env):
        calls["argv"] = new_argv
        calls["env"] = env
        raise SystemExit  # execve never returns; simulate process swap

    import sys as real_sys

    monkeypatch.delenv(device_guard._REEXEC_ENV, raising=False)
    monkeypatch.setattr(device_guard.os, "execve", fake_execve)
    monkeypatch.setattr(device_guard.sys, "argv", argv)
    # pretend a plain-script launch (pytest itself may be a -m launch)
    monkeypatch.setattr(real_sys.modules["__main__"], "__spec__", None)
    monkeypatch.setattr(device_guard.time, "sleep", lambda s: None)
    with pytest.raises(SystemExit):
        device_guard.reexec_with_resume()
    return calls


def test_reexec_appends_resume_and_disables_overwrite(monkeypatch):
    calls = _capture_reexec(
        monkeypatch, ["train.py", "--config", "c.yaml"])
    argv = calls["argv"]
    assert argv[argv.index("--resume") + 1] == "auto"
    assert argv[argv.index("--overwrite") + 1] == "false"
    assert calls["env"][device_guard._REEXEC_ENV] == "1"


def test_reexec_rewrites_fixed_resume_to_auto(monkeypatch):
    calls = _capture_reexec(
        monkeypatch,
        ["train.py", "--config", "c.yaml", "--resume", "save/run/10",
         "--overwrite", "true"])
    argv = calls["argv"]
    assert argv[argv.index("--resume") + 1] == "auto"
    assert "save/run/10" not in argv
    assert argv[argv.index("--overwrite") + 1] == "false"


def test_reexec_rebuilds_module_launch(monkeypatch):
    """`python -m pkg.cli` launches must be re-run with -m, not by script
    path (the package would not be importable)."""
    import sys as real_sys
    import types

    calls = {}

    def fake_execve(path, new_argv, env):
        calls["argv"] = new_argv
        raise SystemExit

    class FakeSpec:
        name = "shift_gcn_tpu.cli.train"

    monkeypatch.delenv(device_guard._REEXEC_ENV, raising=False)
    monkeypatch.setattr(device_guard.os, "execve", fake_execve)
    monkeypatch.setattr(
        device_guard.sys, "argv",
        ["/root/repo/shift_gcn_tpu/cli/train.py", "--config", "c.yaml"])
    monkeypatch.setattr(real_sys.modules["__main__"], "__spec__",
                        FakeSpec())
    monkeypatch.setattr(device_guard.time, "sleep", lambda s: None)
    with pytest.raises(SystemExit):
        device_guard.reexec_with_resume()
    argv = calls["argv"]
    assert argv[1:3] == ["-m", "shift_gcn_tpu.cli.train"]
    assert "/root/repo/shift_gcn_tpu/cli/train.py" not in argv
