"""Probe 3: where does the TP [1,8] Trainer hang? Tiny run with stage prints."""
import os, sys, time
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(os.environ["SGT_MH_PID"])
jax.distributed.initialize(os.environ["SGT_MH_COORD"], 2, pid)

def log(msg):
    print(f"[p{pid} {time.strftime('%H:%M:%S')}] {msg}", flush=True)

import pickle, tempfile, yaml
tmp = os.environ["SGT_MH_TMP"]
log("building trainer")
from shift_gcn_tpu.train.config import load_config
from shift_gcn_tpu.train.trainer import Trainer
cfg = load_config(["--config", os.path.join(tmp, "cfg.yaml")])
cfg.work_dir = os.path.join(cfg.work_dir, f"p{pid}")
tr = Trainer(cfg)
log("trainer built; training epoch 0")
stats = tr.train_epoch(0)
log(f"epoch done loss={stats['loss']:.4f}")
tr.save(0)
log("saved")
acc = tr.evaluate(0)
log(f"eval acc={acc}")
log("PROBE3 PASS")
