"""Trainer — the reference Processor (main.py:172-546) rebuilt TPU-native.

Differences from the reference by design:
- train/eval steps are jit-compiled pure functions sharded over a device
  mesh (data parallelism via sharding annotations; XLA emits the gradient
  all-reduce) instead of nn.DataParallel scatter/gather,
- checkpoints are Orbax pytrees {params, bn_state, opt momentum, metadata}
  instead of torch .pt (a converter imports reference .pt files),
- the input pipeline is the host-side prefetching BatchIterator.

Behavioral parity preserved: per-epoch step-decay LR with warmup
(main.py:342-353), per-parameter weight-decay table (main.py:307-317),
epoch cadence of save/eval, best-accuracy score pickles consumed by the
ensemble tools (main.py:493-515), wrong/right prediction files in test
phase (main.py:534-546).
"""

from __future__ import annotations

import glob
import os
import pickle
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from shift_gcn_tpu.data.feeder import BatchIterator, Feeder
from shift_gcn_tpu.models import shift_gcn
from shift_gcn_tpu.parallel import mesh as mesh_lib
from shift_gcn_tpu.train import config as config_lib
from shift_gcn_tpu.train import state as state_lib
from shift_gcn_tpu.train.optim import build_weight_decay_tree, step_decay_lr
from shift_gcn_tpu.utils import checkpoint as ckpt_lib
from shift_gcn_tpu.utils.logging import RunLogger


class Trainer:
    def __init__(self, cfg: config_lib.ExperimentConfig):
        self.cfg = cfg
        self.work_dir = cfg.resolved_work_dir()
        self.save_dir = cfg.resolved_save_dir()
        self.logger = RunLogger(self.work_dir, to_file=cfg.print_log)
        os.makedirs(os.path.join(self.work_dir, "eval_results"),
                    exist_ok=True)
        # resolve the lowering/fusion selection (env > config > default);
        # the snapshot write happens after the model config is built so
        # the work-dir config.yaml records exactly what this run compiles
        # with — and never claims a lowering for a family that has no
        # lowering surface (ops/lowering.py)
        from shift_gcn_tpu.ops import lowering as lowering_lib

        self._explicit_lowering = {**(cfg.model_args.get("lowering") or {}),
                                   **(cfg.lowering or {})}
        self.lowering = lowering_lib.resolve(
            lowering_lib.from_dict(self._explicit_lowering))
        # snapshot the model source into the work dir for reproducibility
        # (reference: main.py:257 copies the model file)
        try:
            import inspect
            import shutil

            shutil.copy2(inspect.getfile(shift_gcn), self.work_dir)
        except Exception:
            pass

        # Resolve `resume: auto` BEFORE any overwrite cleanup so an
        # unattended re-entry (runbook kill/rerun, elastic restart) never
        # deletes the very checkpoint it is about to continue from.
        resume = cfg.resume
        if resume == "auto":
            resume = ckpt_lib.latest_checkpoint(self.save_dir)
            if resume:
                self.logger.log(f"Auto-resume found checkpoint: {resume}")
        self._resume_path = resume
        if cfg.phase == "train" and cfg.overwrite:
            self._cleanup_previous_run()

        from shift_gcn_tpu.models.registry import get_model

        self.family = get_model(cfg.model)
        self.model_config = self.family.build_config(cfg.model_args)
        import dataclasses
        overrides = {}
        valid = {f.name for f in dataclasses.fields(self.model_config)}
        if cfg.compute_dtype and "compute_dtype" in valid:
            overrides["compute_dtype"] = cfg.compute_dtype
        if cfg.activation_dtype and "activation_dtype" in valid:
            overrides["activation_dtype"] = cfg.activation_dtype
        if cfg.remat and "remat" in valid:
            overrides["remat"] = True
        if cfg.use_pallas and "use_pallas" in valid:
            overrides["use_pallas"] = True
        if "lowering" in valid:
            # the fully-resolved selection becomes part of the (static)
            # model config, so the jitted steps' numerics are pinned by
            # value, not by ambient env state
            overrides["lowering"] = self.lowering
            self.cfg.lowering = lowering_lib.as_dict(self.lowering)
        elif self._explicit_lowering:
            # a configured lowering the family cannot honor is an error,
            # not a silent no-op with a false provenance record
            raise ValueError(
                f"model family {cfg.model!r} has no lowering surface "
                f"(its config has no 'lowering' field); configured "
                f"lowering keys {sorted(self._explicit_lowering)} would "
                "be ignored.  Remove the 'lowering' config key, or use "
                "the shift_gcn family.  (SGT_* env vars still apply to "
                "this family's env-resolved ops, e.g. batch_norm.)")
        else:
            # snapshot stays honest: this run has no config-pinned
            # lowering (env/defaults resolve at trace time)
            self.cfg.lowering = {}
        if overrides:
            self.model_config = dataclasses.replace(
                self.model_config, **overrides)
        config_lib.save_config(cfg, os.path.join(self.work_dir,
                                                 "config.yaml"))
        if cfg.debug_nans:
            jax.config.update("jax_debug_nans", True)

        self.mesh = mesh_lib.make_mesh(cfg.mesh_shape)
        data_axis = self.mesh.shape["data"]
        nproc = jax.process_count()
        # Multi-process batch layout (two shapes, both executed by
        # tests/test_multihost.py on the 2-process CPU harness):
        # - data axis crossing processes (data % nproc == 0): batch_size
        #   is the PER-HOST batch; feeders host-shard; the global batch
        #   (nproc * batch_size) is assembled from per-process shards.
        #   Composes with TP (model axis within or across processes) and
        #   shard_time (spec overrides keep the leading axis on 'data').
        # - data axis == 1 (pure tensor/sequence parallelism, e.g. mesh
        #   [1, N] with N spanning processes): every process feeds the
        #   IDENTICAL full batch (same-seed unsharded feeders) and
        #   device_put lands it in the process-spanning sharding.
        self._hosts_shard_data = nproc > 1 and data_axis > 1
        self._replicated_batch = nproc > 1 and data_axis == 1
        if nproc > 1:
            if data_axis > 1 and data_axis % nproc != 0:
                raise ValueError(
                    f"mesh data axis ({data_axis}) must be 1 (replicated "
                    f"batches) or divisible by the process count "
                    f"({nproc}) so host shards map onto it")
            for name, bs in (("batch_size", cfg.batch_size),
                             ("test_batch_size", cfg.test_batch_size)):
                global_bs = bs * (nproc if self._hosts_shard_data else 1)
                if global_bs % data_axis != 0:
                    raise ValueError(
                        f"{name}={bs} (global {global_bs}) must be "
                        f"divisible by the data mesh axis ({data_axis})")
        else:
            for name, bs in (("batch_size", cfg.batch_size),
                             ("test_batch_size", cfg.test_batch_size)):
                if bs % data_axis != 0:
                    raise ValueError(
                        f"{name}={bs} must be divisible by the data mesh "
                        f"axis ({data_axis} devices)")
        if cfg.fourstream:
            from shift_gcn_tpu.train import fourstream as fs

            self.state = fs.create_fourstream_state(
                jax.random.key(cfg.seed), self.model_config,
                init_fn=self.family.init)
        else:
            self.state = state_lib.create_train_state(
                jax.random.key(cfg.seed), self.model_config,
                init_fn=self.family.init)
        self.wd_tree = build_weight_decay_tree(self.state.params)
        self.best_acc = 0.0
        self.start_epoch = cfg.start_epoch

        if cfg.weights:
            self._load_weights(cfg.weights, cfg.ignore_weights)
        if self._resume_path:
            self._resume(self._resume_path)

        self._build_steps()
        self._load_data()

    # ------------------------------------------------------------------
    # setup
    # ------------------------------------------------------------------

    def _cleanup_previous_run(self) -> None:
        # reference: main.py:183-206 — remove stale checkpoints/eval pkls
        # (the RESOLVED resume path is excluded, so `resume: auto` +
        # `overwrite: true` keeps the checkpoint it will continue from)
        resume_abs = (os.path.abspath(self._resume_path)
                      if self._resume_path else None)
        for path in glob.glob(os.path.join(self.save_dir, "*")):
            if resume_abs and os.path.abspath(path) == resume_abs:
                continue
            if os.path.isdir(path):
                import shutil
                shutil.rmtree(path)
        for pkl in glob.glob(os.path.join(self.work_dir, "eval_results",
                                          "*.pkl")):
            os.remove(pkl)

    def _resolve_transfer_dtype(self):
        """See train/transfer.py (shared with the benches)."""
        from shift_gcn_tpu.train.transfer import resolve_transfer_dtype

        return resolve_transfer_dtype(
            self.cfg.transfer_dtype,
            getattr(self.model_config, "activation_dtype", None))

    def _build_steps(self) -> None:
        donate = (0,) if self.cfg.donate_state else ()
        self._transfer_dtype = self._resolve_transfer_dtype()
        if self.cfg.fourstream:
            from shift_gcn_tpu.train import fourstream as fs

            if self.cfg.shard_time:
                raise ValueError(
                    "shard_time is not supported with fourstream "
                    "(docs/DESIGN.md, composition boundaries)")
            if self.cfg.edge_partition:
                raise ValueError(
                    "edge_partition is not supported with fourstream "
                    "(docs/DESIGN.md, composition boundaries)")
            graph = fs.graph_for_config(self.model_config)
            train_step = fs.make_fourstream_train_step(
                self.model_config, self.wd_tree, graph,
                apply_fn=self.family.apply)
            eval_step = fs.make_fourstream_eval_step(
                self.model_config, graph, apply_fn=self.family.apply)
        elif self.cfg.edge_partition:
            # graph/edge partition (the north-star mode): the
            # fixed-topology aggregation's COO edge list sharded over the
            # 'model' mesh axis, batch over 'data'
            import inspect

            from shift_gcn_tpu.parallel import edge_partition as ep

            if self.cfg.shard_time:
                raise ValueError(
                    "edge_partition is not supported with shard_time "
                    "(docs/DESIGN.md, composition boundaries)")
            if self.mesh.shape["model"] < 2:
                raise ValueError(
                    "edge_partition needs mesh_shape [data, model] with "
                    "model >= 2 (the 'model' axis carries the edge shards)")
            apply_params = inspect.signature(
                self.family.apply).parameters
            if self.cfg.edge_strategy == "ring":
                # node-sharded ring training: for families whose apply
                # takes ring_steps (the ring_gnn family — graphs too
                # large to replicate node features;
                # configs/synthetic_ring.yaml).  The skeleton families
                # stay on 'gather': at V <= 33 replication is free and
                # node-sharding gains nothing (docs/DESIGN.md,
                # composition boundaries).
                if "ring_steps" not in apply_params:
                    raise ValueError(
                        f"edge_strategy='ring' is not supported by model "
                        f"family {self.cfg.model!r} (its apply() has no "
                        "ring_steps parameter).  Ring node-sharding is "
                        "for graphs too large to replicate — use the "
                        "ring_gnn family (configs/synthetic_ring.yaml); "
                        "skeleton graphs (V<=33) train with "
                        "edge_strategy='gather' (docs/DESIGN.md)")
                sharded_apply = ep.make_ring_sharded_apply(
                    self.model_config, self.mesh,
                    batch_axis="data", edge_axis="model",
                    apply_fn=self.family.apply)
            elif self.cfg.edge_strategy == "gather":
                if "edges" not in apply_params:
                    raise ValueError(
                        f"edge_partition is not supported by model family "
                        f"{self.cfg.model!r} (its apply() has no edges "
                        "parameter; the stgcn family has)")
                # one shard_map'd apply (one device-resident partitioned
                # edge list) shared by both steps
                sharded_apply = ep.make_edge_sharded_apply(
                    self.model_config, self.mesh,
                    batch_axis="data", edge_axis="model",
                    apply_fn=self.family.apply)
            else:
                raise ValueError(
                    f"unknown edge_strategy={self.cfg.edge_strategy!r} "
                    "(expected 'gather' or 'ring')")
            train_step = ep.make_edge_sharded_train_step(
                self.model_config, self.wd_tree, self.mesh,
                batch_axis="data", edge_axis="model",
                sharded_apply=sharded_apply)
            eval_step = ep.make_edge_sharded_eval_step(
                self.model_config, self.mesh,
                batch_axis="data", edge_axis="model",
                sharded_apply=sharded_apply)
            # commit the state replicated over this mesh: restored
            # checkpoints land committed on one device, which conflicts
            # with the mesh-sharded batch/edges inside shard_map
            self.state = jax.device_put(
                self.state, mesh_lib.replicated(self.mesh))
        elif self.cfg.shard_time:
            # sequence parallelism: T sharded over the 'model' mesh axis,
            # batch over 'data', inside one shard_map program
            import inspect

            from shift_gcn_tpu.parallel import seqpar

            if self.mesh.shape["model"] < 2:
                raise ValueError(
                    "shard_time needs mesh_shape [data, model] with "
                    "model >= 2 (the 'model' axis carries the T shards)")
            apply_params = inspect.signature(
                self.family.apply).parameters
            if "time_axis" not in apply_params:
                raise ValueError(
                    f"shard_time is not supported by model family "
                    f"{self.cfg.model!r} (its apply() has no time_axis "
                    "parameter)")
            train_step = seqpar.make_time_sharded_train_step(
                self.model_config, self.wd_tree, self.mesh,
                batch_axis="data", time_axis="model",
                apply_fn=self.family.apply)
            eval_step = seqpar.make_time_sharded_eval_step(
                self.model_config, self.mesh,
                batch_axis="data", time_axis="model",
                apply_fn=self.family.apply)
            # commit the state replicated over the mesh: when the time
            # axis spans processes the shard_map's inputs must already be
            # global arrays (a process-local committed state cannot be
            # auto-resharded into a cross-process computation)
            self.state = jax.device_put(
                self.state, mesh_lib.replicated(self.mesh))
        else:
            train_step = state_lib.make_train_step(
                self.model_config, self.wd_tree, apply_fn=self.family.apply)
            eval_step = state_lib.make_eval_step(
                self.model_config, apply_fn=self.family.apply)
        if self._transfer_dtype is not np.float32:
            # batch arrives in the compact transfer dtype; restore fp32 on
            # DEVICE before the step proper (models/oracles see fp32)
            from shift_gcn_tpu.train.transfer import restore_batch_fp32

            _train_inner, _eval_inner = train_step, eval_step

            def train_step(state, batch, lr):
                return _train_inner(state, restore_batch_fp32(batch), lr)

            def eval_step(params, bn_state, batch):
                return _eval_inner(params, bn_state,
                                   restore_batch_fp32(batch))

        # multi-process: pin the output STATE shardings (TP rules in TP
        # mode, replicated otherwise).  Left to itself XLA may emit the
        # updated params in some internally-chosen cross-process layout,
        # which breaks host-side reads (check_shift_range) and resharding
        # on the next step; single-process runs are left unpinned (no
        # program change on the benched path).
        out_shardings = None
        if jax.process_count() > 1:
            if (self.mesh.shape["model"] > 1 and not self.cfg.shard_time
                    and not self.cfg.edge_partition):
                state_out = mesh_lib.state_shardings(self.mesh, self.state)
            else:
                state_out = jax.tree_util.tree_map(
                    lambda _: mesh_lib.replicated(self.mesh), self.state)
            out_shardings = (state_out, mesh_lib.replicated(self.mesh))
        self._train_step = jax.jit(train_step, donate_argnums=donate,
                                   out_shardings=out_shardings)
        if self._replicated_batch:
            # pure TP/seqpar across processes: eval outputs (logits and
            # loss sums over the replicated batch) must come back fully
            # replicated so every process can np.asarray them without a
            # host-side gather (each process scores the whole dataset)
            self._eval_step = jax.jit(
                eval_step, out_shardings=mesh_lib.replicated(self.mesh))
        else:
            self._eval_step = jax.jit(eval_step)
        # transfer batches directly into their sharded layouts (no
        # per-step reshard inside the jit): seqpar shards T over 'model';
        # ring edge-partition shards the NODE axis over 'model' — for the
        # large-V graphs ring exists for, landing the clip replicated
        # would be exactly the memory cost the strategy avoids
        from jax.sharding import PartitionSpec as P

        if self.cfg.shard_time:
            self._batch_specs = {"data": P("data", None, "model")}
        elif self.cfg.edge_partition and self.cfg.edge_strategy == "ring":
            self._batch_specs = {
                "data": P("data", None, None, "model", None)}
        else:
            self._batch_specs = None
        if (self.mesh.shape["model"] > 1 and not self.cfg.shard_time
                and not self.cfg.edge_partition):
            # tensor parallelism: commit the state to the TP shardings
            # (Linear_weight / temporal_linear output channels over
            # 'model'); jit then propagates them through the step
            self.state = jax.device_put(
                self.state, mesh_lib.state_shardings(self.mesh, self.state))

    def _put_batch(self, batch):
        """Host batch -> sharded global device batch for this run's mode."""
        return mesh_lib.shard_batch(
            self.mesh, batch, specs=self._batch_specs,
            replicated_batch=self._replicated_batch)

    def _load_data(self) -> None:
        cfg = self.cfg
        # replicated-batch multi-process modes (pure TP/seqpar) feed every
        # process the identical full batch: unsharded same-seed feeders
        host_id = jax.process_index() if self._hosts_shard_data else 0
        num_hosts = jax.process_count() if self._hosts_shard_data else 1
        self.feeders: Dict[str, Feeder] = {}
        self.iterators: Dict[str, BatchIterator] = {}
        extra = {"native": True} if cfg.native_loader else {}
        if cfg.phase == "train":
            self.feeders["train"] = Feeder(**cfg.train_feeder_args, **extra)
            self.iterators["train"] = BatchIterator(
                self.feeders["train"], cfg.batch_size, shuffle=True,
                drop_last=True, seed=cfg.seed, host_id=host_id,
                num_hosts=num_hosts)
        self.feeders["test"] = Feeder(**cfg.test_feeder_args, **extra)
        self.iterators["test"] = BatchIterator(
            self.feeders["test"], cfg.test_batch_size, shuffle=False,
            drop_last=False, seed=cfg.seed, host_id=host_id,
            num_hosts=num_hosts)

    def _load_weights(self, path: str, ignore: Optional[list] = None) -> None:
        """Load model weights from an Orbax checkpoint dir or a reference
        torch .pt/.pkl (main.py:261-292)."""
        self.logger.log(f"Load weights from {path}.")
        if path.endswith((".pt", ".pkl", ".pth")):
            params, bn_state, _ = ckpt_lib.load_reference_checkpoint(path)
            params = jax.tree_util.tree_map(jnp.asarray, params)
            bn_state = jax.tree_util.tree_map(jnp.asarray, bn_state)
            merged_p = _merge_trees(self.state.params, params,
                                    ignore or [], self.logger)
            merged_s = _merge_trees(self.state.bn_state, bn_state, [],
                                    self.logger)
            self.state = self.state._replace(params=merged_p,
                                             bn_state=merged_s)
        else:
            payload = ckpt_lib.restore_checkpoint(
                path, {"params": self.state.params,
                       "bn_state": self.state.bn_state})
            self.state = self.state._replace(
                params=payload["params"], bn_state=payload["bn_state"])

    def _resume(self, path: str) -> None:
        # reference: main.py:215-229
        self.logger.log(f"Resuming from checkpoint: {path}")
        template = {
            "params": self.state.params,
            "bn_state": self.state.bn_state,
            "opt_state": self.state.opt_state,
            "global_step": self.state.global_step,
            "meta": {"epoch": 0, "best_acc": 0.0},
        }
        payload = ckpt_lib.restore_checkpoint(path, template)
        self.state = state_lib.TrainState(
            params=payload["params"],
            bn_state=payload["bn_state"],
            opt_state=payload["opt_state"],
            global_step=payload["global_step"],
        )
        # restored arrays land committed on one device; commit them
        # replicated over the mesh so a resume that goes straight to
        # eval (resumed-past-the-end rerun) composes with mesh-sharded
        # batches (TP/edge modes re-commit their own shardings in
        # _build_steps afterwards).  Multi-process: replication to a
        # process-spanning mesh must start from HOST values (device_put
        # from a committed local device array would need a cross-host
        # device transfer, unsupported on this backend; every process
        # restored the identical full state from the shared checkpoint)
        if jax.process_count() > 1:
            self.state = jax.tree_util.tree_map(np.asarray, self.state)
        self.state = jax.device_put(
            self.state, mesh_lib.replicated(self.mesh))
        self.start_epoch = int(payload["meta"]["epoch"]) + 1
        self.best_acc = float(payload["meta"]["best_acc"])
        # global_step is a scalar normally, a stacked (4,) under fourstream
        step_no = int(np.asarray(self.state.global_step).reshape(-1)[0])
        self.logger.log(
            f"  Resumed: epoch={self.start_epoch}, "
            f"global_step={step_no}, "
            f"best_acc={self.best_acc:.4f}")

    # ------------------------------------------------------------------
    # phases
    # ------------------------------------------------------------------

    def start(self) -> float:
        cfg = self.cfg
        if cfg.phase == "train":
            self.logger.log(f"Parameters:\n{cfg}\n")
            for epoch in range(self.start_epoch, cfg.num_epoch):
                is_last = epoch + 1 == cfg.num_epoch
                stats = self.train_epoch(epoch)
                self._guard_device(stats)
                if is_last or (epoch + 1) % cfg.save_interval == 0:
                    self.save(epoch)
                if is_last or (epoch + 1) % cfg.eval_interval == 0:
                    self.evaluate(epoch)
            best_pkl = os.path.join(self.work_dir, "eval_results",
                                    "best_acc.pkl")
            need_final_eval = not os.path.exists(best_pkl)
            if jax.process_count() > 1:
                # work_dir is per-process in multi-host runs; after a kill
                # during the final eval ANY subset of processes may have
                # written its pickle, and evaluate() runs cross-process
                # collectives — every process must make the SAME call or
                # the others deadlock.  OR the per-process views: if any
                # process is missing its pickle, all re-enter the eval
                # (the ones that have it just rewrite identical content).
                from jax.experimental import multihost_utils as mhu

                flags = mhu.process_allgather(
                    np.asarray(need_final_eval))
                need_final_eval = bool(np.asarray(flags).any())
            if need_final_eval:
                # resumed-past-the-end runs (auto-resume after a kill
                # DURING the final eval: the checkpoint exists, so the
                # epoch loop above is empty) would otherwise never
                # produce the score pickle the ensemble consumes —
                # evaluate once so a plain rerun always completes the
                # contract (reference: main.py:496-502)
                self.logger.log(
                    "No best-score pickle found after training; running "
                    "the final evaluation")
                self.evaluate(cfg.num_epoch - 1)
            self.logger.log(
                f"best accuracy: {self.best_acc} "
                f"model_name: {self.save_dir}")
        elif cfg.phase == "test":
            if cfg.weights is None:
                raise ValueError("Please appoint --weights.")
            wrong_file = result_file = None
            if not cfg.test_feeder_args.get("debug", False):
                wrong_file = os.path.join(self.work_dir, "wrong.txt")
                result_file = os.path.join(self.work_dir, "right.txt")
            self.logger.log(f"Model:   {cfg.model}.")
            self.logger.log(f"Weights: {cfg.weights}.")
            self.evaluate(0, wrong_file=wrong_file, result_file=result_file)
            self.logger.log("Done.\n")
        return self.best_acc

    def train_epoch(self, epoch: int) -> Dict[str, float]:
        cfg = self.cfg
        self.logger.log(f"Training epoch: {epoch + 1}")
        lr = step_decay_lr(epoch, cfg.base_lr, cfg.step, cfg.warm_up_epoch)
        lr_arr = jnp.asarray(lr, jnp.float32)
        it = self.iterators["train"]
        nb = it.batches_per_epoch()
        losses, accs = [], []
        timer = {"dataloader": 1e-3, "model": 1e-3, "statistics": 1e-3}
        profiling = bool(cfg.profile_dir) and epoch == self.start_epoch
        if profiling:
            jax.profiler.start_trace(cfg.profile_dir)
        # The hot loop is fully pipelined: host batching + the (blocking)
        # host->device transfer run on a prefetch thread one step ahead,
        # and per-step metrics stay ON DEVICE until the epoch ends — any
        # per-step np.asarray would synchronize with the accelerator and
        # serialize transfer against compute (the reference pays exactly
        # that cost with loss.data.item() per batch, main.py:409-421).
        from concurrent.futures import ThreadPoolExecutor

        it_epoch = iter(it.epoch(epoch))

        def fetch_next():
            try:
                data, label, index, mask = next(it_epoch)
            except StopIteration:
                return None
            return self._put_batch({
                "data": data.astype(self._transfer_dtype),
                "label": label,
            })

        start_step = int(np.asarray(self.state.global_step).reshape(-1)[0])
        step_metrics = []
        t0 = time.time()
        metrics = None
        with ThreadPoolExecutor(max_workers=1) as pool:
            pending = pool.submit(fetch_next)
            b = 0
            while True:
                mark = time.time()
                batch = pending.result()
                timer["dataloader"] += time.time() - mark
                if batch is None:
                    break
                pending = pool.submit(fetch_next)
                mark = time.time()
                self.state, metrics = self._train_step(
                    self.state, batch, lr_arr)
                step_metrics.append(metrics)
                if profiling and b + 1 >= cfg.profile_steps:
                    jax.block_until_ready(metrics)
                    jax.profiler.stop_trace()
                    profiling = False
                    self.logger.log(
                        f"\tProfiler trace written to {cfg.profile_dir}")
                timer["model"] += time.time() - mark
                step_no = start_step + b + 1
                if (step_no % cfg.log_interval) == 0:
                    loss_arr = np.asarray(metrics["loss"])  # sync (rare)
                    extra = ""
                    if cfg.fourstream:
                        extra = "  streams:" + "/".join(
                            f"{v:.3f}" for v in loss_arr.reshape(-1))
                    self.logger.log(
                        f"\tBatch({b}/{nb}) done. "
                        f"Loss: {float(np.mean(loss_arr)):.4f}  "
                        f"lr:{lr:.6f}{extra}")
                b += 1
        if metrics is not None:
            mark = time.time()
            jax.block_until_ready(metrics)
            timer["model"] += time.time() - mark
        if profiling:
            jax.profiler.stop_trace()
        mark = time.time()
        for m in step_metrics:
            losses.append(float(np.mean(np.asarray(m["loss"]))))
            accs.append(float(np.mean(np.asarray(m["acc"]))))
        timer["statistics"] += time.time() - mark
        dt = time.time() - t0
        total = sum(timer.values())
        proportion = {k: f"{int(round(v * 100 / total)):02d}%"
                      for k, v in timer.items()}
        mean_loss = float(np.mean(losses)) if losses else float("nan")
        mean_acc = float(np.mean(accs)) if accs else float("nan")
        clips = nb * cfg.batch_size
        self.logger.log(
            f"\tMean training loss: {mean_loss:.4f}  acc: {mean_acc:.4f}  "
            f"({clips / max(dt, 1e-9):.1f} clips/s)  "
            f"time: {proportion}")
        return {"loss": mean_loss, "acc": mean_acc,
                "clips_per_sec": clips / max(dt, 1e-9)}

    def evaluate(self, epoch: int, wrong_file: Optional[str] = None,
                 result_file: Optional[str] = None) -> float:
        # eval boundaries come more often than saves (eval_interval=5 vs
        # save_interval=2 both exist in reference configs) — check the
        # shift tap radius here too so a ypos walking past MAX_SHIFT is
        # caught at the next eval, not only at the next save
        self.check_shift_range()
        if self.cfg.fourstream:
            return self._evaluate_fourstream(
                epoch, wrong_file=wrong_file, result_file=result_file)
        cfg = self.cfg
        self.logger.log(f"Eval epoch: {epoch + 1}")
        it = self.iterators["test"]
        feeder = self.feeders["test"]
        scores = []
        loss_sum = 0.0
        n_sum = 0.0
        f_w = open(wrong_file, "w") if wrong_file else None
        f_r = open(result_file, "w") if result_file else None
        # Keep per-batch outputs on device until the loop ends: a per-batch
        # np.asarray would synchronize and serialize host batching against
        # device compute (logits are (B, num_class) scalars-scale — holding
        # an epoch of them costs nothing).
        # Host-side gathering only applies when hosts iterate DISJOINT
        # dataset shards; in the replicated-batch modes (pure TP/seqpar)
        # every process scores the full dataset and the eval step returns
        # fully-replicated outputs (see _build_steps) — gathering would
        # double-count every sample.
        multihost = self._hosts_shard_data
        pending_out = []
        indices = []
        try:
            for data, label, index, mask in it.epoch(0):
                batch = self._put_batch({
                    "data": data.astype(self._transfer_dtype),
                    "label": label,
                    "mask": mask,
                })
                logits, lsum, n = self._eval_step(
                    self.state.params, self.state.bn_state, batch)
                pending_out.append((logits, lsum, n, label, index, mask))
            for logits, lsum, n, label, index, mask in pending_out:
                if multihost:
                    # the global logits span non-addressable devices;
                    # gather everything host-side (tiled = concatenated
                    # in process order, matching the global batch order)
                    from jax.experimental import multihost_utils as mhu

                    logits, label, index, mask = (
                        np.asarray(a) for a in mhu.process_allgather(
                            (logits, np.asarray(label),
                             np.asarray(index), np.asarray(mask)),
                            tiled=True))
                else:
                    logits = np.asarray(logits)
                valid = mask > 0
                scores.append(logits[valid])
                indices.append(np.asarray(index)[valid])
                loss_sum += float(lsum)
                n_sum += float(n)
                if f_w or f_r:
                    preds = logits.argmax(-1)
                    for i in np.nonzero(valid)[0]:
                        if f_r:
                            f_r.write(f"{preds[i]},{label[i]}\n")
                        if f_w and preds[i] != label[i]:
                            f_w.write(f"{index[i]},{preds[i]},{label[i]}\n")
        finally:
            if f_w:
                f_w.close()
            if f_r:
                f_r.close()
        score = np.concatenate(scores)
        if multihost:
            # host-sharded iteration interleaves the hosts' dataset
            # shards; restore dataset order (top_k and the score pickles
            # assume it)
            order = np.argsort(np.concatenate(indices), kind="stable")
            score = score[order]
        accuracy = feeder.top_k(score, 1)
        score_dict = dict(zip(feeder.sample_name, score))
        eval_dir = os.path.join(self.work_dir, "eval_results")
        best_pkl = os.path.join(eval_dir, "best_acc.pkl")
        if accuracy > self.best_acc:
            self.best_acc = accuracy
            with open(best_pkl, "wb") as f:
                pickle.dump(score_dict, f)
        elif not os.path.exists(best_pkl):
            # recovery: the historical best pickle is gone (kill during
            # a final eval, overwrite cleanup) and this eval did not
            # beat the checkpoint-restored best_acc — the ensemble's
            # score-pickle contract still must complete, so restore it
            # with the closest available scores (best_acc itself keeps
            # the historical value)
            with open(best_pkl, "wb") as f:
                pickle.dump(score_dict, f)
        self.logger.log(
            f"\tMean test loss: {loss_sum / max(n_sum, 1):.4f}.")
        for k in cfg.show_topk:
            self.logger.log(
                f"\tTop{k}: {100 * feeder.top_k(score, k):.2f}%")
        with open(os.path.join(
                eval_dir, f"epoch_{epoch}_{accuracy}.pkl"), "wb") as f:
            pickle.dump(score_dict, f)
        return accuracy

    def _guard_device(self, epoch_stats: Dict[str, float]) -> None:
        """Epoch-boundary health check against the platform's zombie-worker
        mode (executions no-op instantly and return garbage).  Suspicion
        triggers: implausibly fast epoch, or a non-finite mean loss.  A
        confirmed-dead device cannot be trusted to serialize the train
        state, so recovery is re-exec + resume from the last checkpoint.
        """
        if not self.cfg.device_guard:
            return
        from shift_gcn_tpu.utils import device_guard

        suspicious = (
            not device_guard.plausible_throughput(
                epoch_stats.get("clips_per_sec", 0.0))
            or not np.isfinite(epoch_stats.get("loss", 0.0)))
        if not suspicious:
            return
        self.logger.log(
            "\tSuspicious epoch reading "
            f"({epoch_stats.get('clips_per_sec', 0):.0f} clips/s, "
            f"loss={epoch_stats.get('loss', float('nan'))}); "
            "checking device health")
        try:
            device_guard.check(logger=self.logger)
        except device_guard.DeviceUnhealthyError:
            device_guard.reexec_with_resume(logger=self.logger)

    def _evaluate_fourstream(self, epoch: int,
                             wrong_file: Optional[str] = None,
                             result_file: Optional[str] = None) -> float:
        """Eval all four streams + weighted ensemble in one pass.

        Per-stream score pickles keep the reference's per-experiment file
        contract (ensemble*.py consumes {sample_name: score} dicts); the
        ensemble fusion itself is also computed here directly.
        wrong/right prediction files (test phase) use the ensemble
        prediction (reference: main.py:534-546)."""
        from shift_gcn_tpu.train import fourstream as fs

        cfg = self.cfg
        self.logger.log(f"Eval epoch: {epoch + 1} (four-stream)")
        it = self.iterators["test"]
        feeder = self.feeders["test"]
        scores4 = [[] for _ in fs.STREAMS]
        ens_scores = []
        indices = []
        loss_sum = np.zeros(len(fs.STREAMS))
        n_sum = 0.0
        # multi-process: per-host feeder shards interleave the dataset;
        # fetch the GLOBAL logits (they span non-addressable devices) and
        # the composed global label/index/mask, then restore dataset
        # order at the end — same contract as the plain evaluate()
        multihost = self._hosts_shard_data
        f_w = open(wrong_file, "w") if wrong_file else None
        f_r = open(result_file, "w") if result_file else None
        # Keep per-batch outputs on device until the loop ends (same
        # rationale + structure as the plain evaluate(): a per-batch
        # np.asarray/allgather would synchronize and serialize host
        # batching against device compute).
        pending_out = []
        try:
            for data, label, index, mask in it.epoch(0):
                batch = self._put_batch({
                    "data": data.astype(self._transfer_dtype),
                    "label": label,
                    "mask": mask,
                })
                logits4, ensemble, lsum4, ns = self._eval_step(
                    self.state.params, self.state.bn_state, batch)
                pending_out.append(
                    (logits4, ensemble, lsum4, ns, label, index, mask))
            for logits4, ensemble, lsum4, ns, label, index, mask in \
                    pending_out:
                if multihost:
                    from jax.experimental import multihost_utils as mhu

                    logits4, ensemble = (
                        np.asarray(a) for a in mhu.process_allgather(
                            (logits4, ensemble), tiled=True))
                    label, index, mask = (
                        np.asarray(a) for a in mhu.process_allgather(
                            (np.asarray(label), np.asarray(index),
                             np.asarray(mask)), tiled=True))
                else:
                    logits4 = np.asarray(logits4)
                    ensemble = np.asarray(ensemble)
                valid = mask > 0
                for i in range(len(fs.STREAMS)):
                    scores4[i].append(logits4[i][valid])
                ens_scores.append(ensemble[valid])
                indices.append(np.asarray(index)[valid])
                loss_sum += np.asarray(lsum4)
                n_sum += float(np.asarray(ns)[0])
                if f_w or f_r:
                    preds = ensemble.argmax(-1)
                    for j in np.nonzero(valid)[0]:
                        if f_r:
                            f_r.write(f"{preds[j]},{label[j]}\n")
                        if f_w and preds[j] != label[j]:
                            f_w.write(f"{index[j]},{preds[j]},{label[j]}\n")
        finally:
            if f_w:
                f_w.close()
            if f_r:
                f_r.close()
        ens = np.concatenate(ens_scores)
        stream_scores = [np.concatenate(s) for s in scores4]
        if multihost:
            order = np.argsort(np.concatenate(indices), kind="stable")
            ens = ens[order]
            stream_scores = [s[order] for s in stream_scores]
        accuracy = feeder.top_k(ens, 1)
        eval_dir = os.path.join(self.work_dir, "eval_results")
        for stream, s in zip(fs.STREAMS, stream_scores):
            i = fs.STREAMS.index(stream)
            acc_i = feeder.top_k(s, 1)
            self.logger.log(
                f"\t{stream}: loss {loss_sum[i] / max(n_sum, 1):.4f}  "
                f"top1 {100 * acc_i:.2f}%")
            with open(os.path.join(
                    eval_dir, f"epoch_{epoch}_{stream}.pkl"), "wb") as f:
                pickle.dump(dict(zip(feeder.sample_name, s)), f)
        self.logger.log(f"\tensemble top1: {100 * accuracy:.2f}%")
        score_dict = dict(zip(feeder.sample_name, ens))
        improved = accuracy > self.best_acc
        if improved or not os.path.exists(
                os.path.join(eval_dir, "best_acc.pkl")):
            # on improvement, or in recovery when the historical best
            # pickle is gone (see the same clause in evaluate()) — the
            # ensemble's score-pickle contract must always complete
            if improved:
                self.best_acc = accuracy
            with open(os.path.join(eval_dir, "best_acc.pkl"), "wb") as f:
                pickle.dump(score_dict, f)
            for stream, s in zip(fs.STREAMS, stream_scores):
                with open(os.path.join(
                        eval_dir, f"best_acc_{stream}.pkl"), "wb") as f:
                    pickle.dump(dict(zip(feeder.sample_name, s)), f)
        with open(os.path.join(
                eval_dir, f"epoch_{epoch}_{accuracy}.pkl"), "wb") as f:
            pickle.dump(score_dict, f)
        return accuracy

    def check_shift_range(self) -> None:
        """Guard the static temporal tap radius: every Shift's ypos must
        stay inside this run's lowering.max_shift or results silently
        clip."""
        from shift_gcn_tpu.ops.temporal_shift import assert_in_range

        for name, leaf in _flatten(self.state.params):
            if name.endswith("ypos"):
                if not (getattr(leaf, "is_fully_addressable", True)
                        or leaf.sharding.is_fully_replicated):
                    # cross-process layouts: fetch the global value
                    from jax.experimental import multihost_utils as mhu

                    leaf = mhu.process_allgather(leaf, tiled=True)
                assert_in_range(leaf, name,
                                max_shift=self.lowering.max_shift)

    def save(self, epoch: int) -> str:
        self.check_shift_range()
        # multi-process: every process calls into Orbax (its multihost
        # barrier requires all participants); Orbax's primary-host logic
        # makes the write itself single-writer (reference contrast:
        # single-process torch.save, main.py:436-448)
        payload = {
            "params": self.state.params,
            "bn_state": self.state.bn_state,
            "opt_state": self.state.opt_state,
            "global_step": self.state.global_step,
            "meta": {"epoch": epoch, "best_acc": float(self.best_acc)},
        }
        path = ckpt_lib.save_checkpoint(self.save_dir, epoch, payload)
        self.logger.log(f"\tSaved checkpoint: {path}")
        return path


def _merge_trees(base: Any, update: Any, ignore: list, logger) -> Any:
    """Partial state-dict merge with missing-key report
    (reference: main.py:277-292)."""
    flat_base = dict(_flatten(base))
    flat_update = dict(_flatten(update))
    for name in ignore:
        removed = [k for k in flat_update if name in k]
        for k in removed:
            flat_update.pop(k)
            logger.log(f"Successfully Remove Weights: {k}.")
    missing = set(flat_base) - set(flat_update)
    if missing:
        logger.log("Can not find these weights:")
        for k in sorted(missing):
            logger.log("  " + k)
    for k, v in flat_update.items():
        if k in flat_base:
            if flat_base[k].shape != np.asarray(v).shape:
                raise ValueError(
                    f"shape mismatch for {k}: "
                    f"{flat_base[k].shape} vs {np.asarray(v).shape}")
            flat_base[k] = jnp.asarray(v)
    return _unflatten(flat_base)


def _flatten(tree: Any, prefix: str = ""):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flatten(v, f"{prefix}{k}.")
    else:
        yield prefix[:-1], tree


def _unflatten(flat: Dict[str, Any]) -> Any:
    out: Dict[str, Any] = {}
    for key, value in flat.items():
        node = out
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return out
