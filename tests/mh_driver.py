"""Child driver for tests/test_multihost.py — NOT a test module.

Runs the real Trainer as one process of a 2-process CPU jax.distributed
job (gloo collectives, 4 virtual devices per process = 8-device global
mesh) and prints a JSON result line the parent test asserts on.  The
parallelism mode comes entirely from the config file (mesh_shape /
shard_time), so the same driver executes DP, cross-process TP, and
cross-process sequence parallelism.
"""

import json
import os

import numpy as np


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    pid = int(os.environ["SGT_MH_PID"])
    jax.distributed.initialize(
        coordinator_address=os.environ["SGT_MH_COORD"],
        num_processes=int(os.environ["SGT_MH_NPROC"]),
        process_id=pid)

    from shift_gcn_tpu.train.config import load_config
    from shift_gcn_tpu.train.trainer import Trainer

    cfg = load_config(["--config", os.environ["SGT_MH_CONFIG"]])
    # per-process WORK dirs (log/config snapshots race-free) but a SHARED
    # checkpoint dir: every process participates in the Orbax save (its
    # multihost barriers and commit markers require one common directory;
    # the primary host does the writing)
    cfg.work_dir = os.path.join(cfg.work_dir, f"p{pid}")
    tr = Trainer(cfg)

    if os.environ.get("SGT_MH_START"):
        # full Trainer.start() — exercises the collective
        # resumed-past-the-end final-eval decision (a kill during the
        # final eval can leave the processes' work dirs disagreeing on
        # best_acc.pkl; a non-collective check deadlocks the rerun)
        best = tr.start()
        print("MHRESULT " + json.dumps({
            "pid": pid, "best_acc": float(best),
            "start_epoch": tr.start_epoch}), flush=True)
        return

    shard = tr.iterators["train"]._epoch_indices(0).tolist()
    losses = []
    for e in range(cfg.num_epoch):
        stats = tr.train_epoch(e)
        losses.append(stats["loss"])
        tr.save(e)
    acc = tr.evaluate(cfg.num_epoch - 1)

    # the gathered eval must have scored EVERY val sample exactly once
    # even though len(val) is indivisible by hosts and batch size
    import pickle

    eval_dir = os.path.join(tr.work_dir, "eval_results")
    pkl = sorted(p for p in os.listdir(eval_dir) if p.startswith("epoch_"))
    with open(os.path.join(eval_dir, pkl[-1]), "rb") as f:
        eval_scores = len(pickle.load(f))

    # param leaves may be sharded ACROSS processes (TP modes): fetch via
    # allgather unless the local view suffices
    from jax.experimental import multihost_utils as mhu

    def fetch(leaf):
        if leaf.is_fully_addressable or leaf.sharding.is_fully_replicated:
            return np.asarray(leaf)
        return np.asarray(mhu.process_allgather(leaf, tiled=True))

    def maybe(path):
        node = tr.state.params
        try:
            for key in path:
                node = node[key]
            return node
        except (KeyError, TypeError):
            return None   # family without this subtree (e.g. stgcn)

    ypos_leaf = maybe(("l1", "tcn1", "shift_in", "ypos"))
    ypos = fetch(ypos_leaf).tolist() if ypos_leaf is not None else None
    checksum = float(sum(
        float(np.abs(fetch(leaf)).sum())
        for leaf in jax.tree_util.tree_leaves(tr.state.params)))
    # sharding evidence for the parent's cross-process-TP assertion: the
    # TP rules put Linear_weight's output channels on the 'model' axis
    lw = maybe(("l1", "gcn1", "Linear_weight"))
    out = {
        "pid": pid,
        "proc_count": jax.process_count(),
        "global_devices": len(jax.devices()),
        "local_devices": len(jax.local_devices()),
        "losses": losses,
        "acc": float(acc),
        "eval_scores": eval_scores,
        "ypos": ypos,
        "checksum": checksum,
        "shard": shard,
        "save_dir": tr.save_dir,
        "ckpts": (sorted(os.listdir(tr.save_dir))
                  if os.path.isdir(tr.save_dir) else []),
        "linear_weight_devices": (len(lw.sharding.device_set)
                                  if lw is not None else None),
        "linear_weight_addressable_shards": (
            len([s for s in lw.addressable_shards])
            if lw is not None else None),
        "linear_weight_shard_rows": (
            list(lw.addressable_shards[0].data.shape)
            if lw is not None and lw.addressable_shards else None),
    }
    print("MHRESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
