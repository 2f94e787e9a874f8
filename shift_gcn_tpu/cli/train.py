"""CLI entry point: ``python -m shift_gcn_tpu.cli.train --config cfg.yaml``.

The reference equivalent is ``python main.py --config <yaml>``
(main.py:566-584); reference YAML configs parse unchanged.
"""

from __future__ import annotations

import os
import sys

import jax


def should_init_distributed(env=None) -> bool:
    """Decide whether to bring up jax.distributed before training.

    `jax.distributed.initialize()` auto-detects its arguments on TPU
    pods, Slurm, and Open MPI — but something still has to CALL it, and
    none of those launchers set JAX_COORDINATOR_ADDRESS (the only
    trigger early revisions checked, which would have left a real pod
    training as N disconnected hosts).  Detection, overridable with
    SGT_DISTRIBUTED=1/0:

    - JAX_COORDINATOR_ADDRESS set -> explicit manual launch (the
      multi-host CPU harness, bare fleets),
    - SLURM_NTASKS > 1 or OMPI_COMM_WORLD_SIZE > 1 -> scheduler launch,
    - TPU_WORKER_HOSTNAMES listing >1 workers -> multi-worker TPU pod
      (the TPU runtime exports the worker roster per host).
    """
    env = os.environ if env is None else env
    force = env.get("SGT_DISTRIBUTED")
    if force is not None:
        # same boolean spellings as the lowering config parser
        return force.strip().lower() not in ("0", "false", "no", "off",
                                             "")
    if env.get("JAX_COORDINATOR_ADDRESS"):
        return True
    for var in ("SLURM_NTASKS", "OMPI_COMM_WORLD_SIZE"):
        try:
            if int(env.get(var, "") or 0) > 1:
                return True
        except ValueError:
            pass
    hostnames = env.get("TPU_WORKER_HOSTNAMES", "")
    if len([h for h in hostnames.split(",") if h.strip()]) > 1:
        return True
    return False


def main(argv=None) -> None:
    from shift_gcn_tpu.train.config import load_config
    from shift_gcn_tpu.train.trainer import Trainer

    # Platform pin (e.g. SGT_PLATFORM=cpu for host-only smoke runs).  The
    # JAX_PLATFORMS env var alone does not work on hosts whose sitecustomize
    # registers an accelerator plugin; jax.config set before first device
    # use does.
    if os.environ.get("SGT_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["SGT_PLATFORM"])

    # Multi-host: initialize the distributed runtime whenever a
    # multi-process launch environment is detected (see
    # should_init_distributed; SGT_DISTRIBUTED=1/0 overrides).  TPU
    # pods / Slurm / Open MPI auto-detect all arguments; bare manual
    # launches (JAX_COORDINATOR_ADDRESS) have no detector for the
    # process count/rank, so those come from SGT_NUM_PROCESSES /
    # SGT_PROCESS_ID.
    if should_init_distributed():
        kwargs = {}
        if os.environ.get("SGT_NUM_PROCESSES"):
            if "SGT_PROCESS_ID" not in os.environ:
                raise SystemExit(
                    "SGT_NUM_PROCESSES is set but SGT_PROCESS_ID is "
                    "not — a manual multi-host launch needs both (the "
                    "per-host rank in [0, num_processes))")
            kwargs = {
                "num_processes": int(os.environ["SGT_NUM_PROCESSES"]),
                "process_id": int(os.environ["SGT_PROCESS_ID"]),
            }
        jax.distributed.initialize(**kwargs)

    cfg = load_config(argv)
    trainer = Trainer(cfg)
    trainer.start()


if __name__ == "__main__":
    main(sys.argv[1:])
