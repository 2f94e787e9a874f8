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


def test_reexec_appends_resume(monkeypatch):
    calls = {}

    def fake_execve(path, argv, env):
        calls["argv"] = argv
        calls["env"] = env
        raise SystemExit  # execve never returns; simulate process swap

    monkeypatch.delenv(device_guard._REEXEC_ENV, raising=False)
    monkeypatch.setattr(device_guard.os, "execve", fake_execve)
    monkeypatch.setattr(device_guard.sys, "argv",
                        ["train.py", "--config", "c.yaml"])
    monkeypatch.setattr(device_guard.time, "sleep", lambda s: None)
    with pytest.raises(SystemExit):
        device_guard.reexec_with_resume()
    assert calls["argv"][-2:] == ["--resume", "auto"]
    assert calls["env"][device_guard._REEXEC_ENV] == "1"
