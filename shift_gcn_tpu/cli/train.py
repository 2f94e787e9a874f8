"""CLI entry point: ``python -m shift_gcn_tpu.cli.train --config cfg.yaml``.

The reference equivalent is ``python main.py --config <yaml>``
(main.py:566-584); reference YAML configs parse unchanged.
"""

from __future__ import annotations

import os
import sys

import jax


def main(argv=None) -> None:
    from shift_gcn_tpu.train.config import load_config
    from shift_gcn_tpu.train.trainer import Trainer

    # Platform pin (e.g. SGT_PLATFORM=cpu for host-only smoke runs).  The
    # JAX_PLATFORMS env var alone does not work on hosts whose sitecustomize
    # registers an accelerator plugin; jax.config set before first device
    # use does.
    if os.environ.get("SGT_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["SGT_PLATFORM"])

    # Multi-host TPU pods: initialize the distributed runtime when launched
    # under a multi-process coordinator.
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()

    cfg = load_config(argv)
    trainer = Trainer(cfg)
    trainer.start()


if __name__ == "__main__":
    main(sys.argv[1:])
