"""Accelerator health guard for long runs.

This platform's remote TPU worker can silently enter a zombie state where
executions no-op instantly and return garbage (observed repeatedly while
benchmarking; bench.py carries the same defense).  The zombie state is
per-connection: in-process retries do not heal it, only a fresh process
(which establishes a new worker claim) does.

The trainer uses this guard at every epoch boundary:

1. `check()` runs a small matmul on the default device and compares it
   against numpy.  Mismatch or device error -> retry after a wait (the
   worker takes 3-20 min to recover after a fault).
2. If the device stays unhealthy, `check()` raises DeviceUnhealthyError.
   The trainer then re-execs the training CLI in a fresh process with
   auto-resume, continuing from the last saved checkpoint (progress since
   the last save_interval is lost, matching what an operator rerunning the
   reference with --resume would get; reference main.py:215-229).

A secondary cheap trigger: `plausible_throughput()` flags epoch readings
faster than any real single-chip step could be (the zombie mode's no-op
executions look "infinitely fast").
"""

from __future__ import annotations

import os
import sys
import time
from typing import Optional

import numpy as np

# A full train step on one chip cannot plausibly exceed this; faster
# readings mean executions are no-oping (same threshold as bench.py).
MAX_PLAUSIBLE_CLIPS_PER_SEC = 3000.0

_REEXEC_ENV = "_SGT_TRAIN_REEXEC"
_MAX_REEXEC = 8


class DeviceUnhealthyError(RuntimeError):
    """The accelerator repeatedly failed the numeric sanity check."""


def device_healthy() -> bool:
    """One-shot check: does the default device compute a matmul correctly?"""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(1234)
    a = rng.standard_normal((128, 128)).astype(np.float32)
    b = rng.standard_normal((128, 128)).astype(np.float32)
    try:
        # precision="highest" pins the fp32 (6-pass) MXU path: the check
        # must not depend on the platform's *default* matmul precision,
        # which changed under us once (default bf16 passes fail atol=1e-2
        # and made a healthy chip look permanently zombied)
        got = np.asarray(jnp.matmul(
            jnp.asarray(a), jnp.asarray(b), precision="highest"))
    except Exception:
        return False
    return bool(np.allclose(got, a @ b, atol=1e-2))


def check(max_tries: int = 3, wait_s: float = 30.0,
          healthy_fn=device_healthy, sleep_fn=time.sleep,
          logger=None) -> None:
    """Verify device health, retrying with waits; raise if it stays bad."""
    for attempt in range(max_tries):
        if healthy_fn():
            return
        if logger is not None:
            logger.log(f"\tDevice sanity check failed "
                       f"(attempt {attempt + 1}/{max_tries}); waiting "
                       f"{wait_s:.0f}s for worker recovery")
        sleep_fn(wait_s)
    raise DeviceUnhealthyError(
        f"accelerator failed {max_tries} sanity checks; "
        "a fresh process is required to re-claim the worker")


def plausible_throughput(clips_per_sec: float) -> bool:
    return clips_per_sec < MAX_PLAUSIBLE_CLIPS_PER_SEC


def reexec_count() -> int:
    return int(os.environ.get(_REEXEC_ENV, "0"))


def _rebuild_launch_argv() -> list:
    """Reconstruct the python invocation for this process.

    ``python -m pkg.mod`` launches must be re-run with ``-m`` (sys.argv[0]
    is the module *file*; executing it directly puts its own directory on
    sys.path and the package import fails).  __main__.__spec__ carries the
    module name exactly in that case.
    """
    main_spec = getattr(sys.modules.get("__main__"), "__spec__", None)
    if main_spec is not None and main_spec.name:
        return [sys.executable, "-m", main_spec.name] + sys.argv[1:]
    return [sys.executable] + sys.argv


def reexec_with_resume(logger=None, extra_argv: Optional[list] = None,
                       wait_s: float = 90.0) -> None:
    """Replace this process with a fresh training invocation.

    The restart resumes from the NEWEST checkpoint: an existing
    ``--resume <path>`` is rewritten to ``--resume auto`` (a fixed path
    would roll training back to the same stale checkpoint every restart),
    and ``--overwrite false`` is forced so the fresh process's cleanup
    pass cannot delete the checkpoints it is about to resume from.
    Raises after _MAX_REEXEC generations to avoid loops when the platform
    is down for good.  os.execve never returns on success.
    """
    depth = reexec_count()
    if depth >= _MAX_REEXEC:
        raise DeviceUnhealthyError(
            f"device still unhealthy after {_MAX_REEXEC} fresh-process "
            "restarts; giving up")
    argv = _rebuild_launch_argv() + (extra_argv or [])
    if "--resume" in argv:
        argv[argv.index("--resume") + 1] = "auto"
    else:
        argv += ["--resume", "auto"]
    if "--overwrite" in argv:
        argv[argv.index("--overwrite") + 1] = "false"
    else:
        argv += ["--overwrite", "false"]
    if logger is not None:
        logger.log(f"\tRe-executing trainer in a fresh process "
                   f"(restart {depth + 1}/{_MAX_REEXEC}): {' '.join(argv)}")
    time.sleep(wait_s)  # give the wedged worker time to be reaped
    os.environ[_REEXEC_ENV] = str(depth + 1)
    os.execve(argv[0], argv, os.environ)
