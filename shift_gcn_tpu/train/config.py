"""Experiment configuration: YAML + CLI with reference-compatible keys.

Priority: CLI > YAML > defaults, with unknown-YAML-key validation — the same
contract as the reference argparse/YAML merge (main.py:34-169, 566-579).
Reference config files (config/*/*.yaml) parse unchanged; paths and a few
TPU-specific knobs are additive.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
from typing import Any, Dict, List, Optional

import yaml


@dataclasses.dataclass
class ExperimentConfig:
    # bookkeeping
    Experiment_name: str = "temp"
    work_dir: str = "./work_dir"
    model_saved_name: str = "./save_models"
    config: Optional[str] = None
    phase: str = "train"              # train | test
    save_score: bool = False
    seed: int = 1
    log_interval: int = 100
    save_interval: int = 2
    eval_interval: int = 5
    print_log: bool = True
    show_topk: List[int] = dataclasses.field(default_factory=lambda: [1, 5])

    # feeder
    feeder: str = "shift_gcn_tpu.data.feeder.Feeder"
    num_worker: int = 2
    train_feeder_args: Dict[str, Any] = dataclasses.field(default_factory=dict)
    test_feeder_args: Dict[str, Any] = dataclasses.field(default_factory=dict)

    # model
    model: str = "shift_gcn_tpu.models.shift_gcn"
    model_args: Dict[str, Any] = dataclasses.field(default_factory=dict)
    weights: Optional[str] = None
    ignore_weights: List[str] = dataclasses.field(default_factory=list)

    # optim
    base_lr: float = 0.01
    step: List[int] = dataclasses.field(default_factory=lambda: [20, 40, 60])
    device: List[int] = dataclasses.field(default_factory=lambda: [0])
    optimizer: str = "SGD"
    nesterov: bool = False
    batch_size: int = 256
    test_batch_size: int = 256
    start_epoch: int = 0
    num_epoch: int = 80
    weight_decay: float = 0.0005
    resume: Optional[str] = None
    only_train_part: bool = True
    only_train_epoch: int = 0
    warm_up_epoch: int = 0
    overwrite: bool = False

    # TPU-native additions
    compute_dtype: Optional[str] = None     # e.g. bfloat16 for matmul inputs
    activation_dtype: Optional[str] = None  # e.g. bfloat16 whole-backbone
                                            # activations (BN stats fp32)
    transfer_dtype: str = "auto"            # host->device batch dtype:
                                            # 'auto' (bfloat16 when
                                            # activation_dtype is bfloat16,
                                            # else float32), 'bfloat16', or
                                            # 'float32'.  bf16 halves the
                                            # per-step transfer bytes (the
                                            # train-side bottleneck on slow
                                            # interconnects; docs/PERF.md);
                                            # data is cast back to fp32 on
                                            # device, so the only numerics
                                            # effect is input quantization
                                            # (docs/PARITY.md)
    mesh_shape: Optional[List[int]] = None  # (data, model); None = all-data
    shard_time: bool = False                # sequence parallelism: shard T
                                            # over the 'model' mesh axis
                                            # (shard_map + halo exchange)
    edge_partition: bool = False            # graph/edge partition: the
                                            # fixed-topology aggregation's
                                            # COO edge list sharded over the
                                            # 'model' mesh axis (stgcn-family
                                            # models; parallel/edge_partition)
    edge_strategy: str = "gather"           # edge exchange strategy for
                                            # edge_partition training
                                            # ('gather'; 'ring' is
                                            # aggregator-only — see
                                            # docs/DESIGN.md composition
                                            # boundaries)
    sync_bn: bool = True                    # global-batch BN under jit
    donate_state: bool = True
    remat: bool = False                     # per-block rematerialization
    use_pallas: bool = False                # fused Pallas spatial kernel
    native_loader: bool = False             # C++ thread-pool batch gather
    profile_dir: Optional[str] = None       # jax.profiler trace output dir
    profile_steps: int = 5                  # steps traced at epoch start
    debug_nans: bool = False                # jax nan-checking mode
    fourstream: bool = False                # train all 4 modality streams
                                            # concurrently (vmapped stacked
                                            # models, on-device bone/motion
                                            # derivation from joint data)
    lowering: Dict[str, Any] = dataclasses.field(
        default_factory=dict)               # lowering/fusion selection
                                            # (ops/lowering.py keys, e.g.
                                            # tshift_impl, sgcn_impl,
                                            # tcn_freq_fuse, max_shift).
                                            # Precedence: SGT_* env >
                                            # these keys > defaults; the
                                            # trainer writes the RESOLVED
                                            # values into the work-dir
                                            # config snapshot
    device_guard: bool = True               # epoch-boundary health check +
                                            # self-healing re-exec (resume
                                            # from last checkpoint) when the
                                            # remote TPU worker zombies

    def resolved_work_dir(self) -> str:
        return os.path.join(self.work_dir, self.Experiment_name)

    def resolved_save_dir(self) -> str:
        return os.path.join(self.model_saved_name, self.Experiment_name)


_BOOL_KEYS = {"save_score", "print_log", "nesterov", "only_train_part",
              "overwrite", "sync_bn", "donate_state", "device_guard",
              "fourstream", "shard_time", "edge_partition"}


def _coerce(value: str, current: Any) -> Any:
    if isinstance(current, bool):
        return value.lower() in ("yes", "true", "t", "y", "1")
    if isinstance(current, int) and not isinstance(current, bool):
        return int(value)
    if isinstance(current, float):
        return float(value)
    return value


def load_config(argv: Optional[List[str]] = None) -> ExperimentConfig:
    """Parse CLI + YAML into an ExperimentConfig (CLI wins over YAML)."""
    parser = argparse.ArgumentParser(
        description="shift_gcn_tpu trainer")
    parser.add_argument("--config", default=None)
    known, overrides = parser.parse_known_args(argv)

    cfg = ExperimentConfig()
    valid_keys = {f.name for f in dataclasses.fields(ExperimentConfig)}

    if known.config:
        with open(known.config) as f:
            yaml_args = yaml.safe_load(f) or {}
        for k, v in yaml_args.items():
            if k not in valid_keys:
                raise KeyError(f"WRONG ARG in {known.config}: {k}")
            setattr(cfg, k, v)
        cfg.config = known.config

    # CLI overrides: --key value (underscores or dashes)
    i = 0
    while i < len(overrides):
        tok = overrides[i]
        if not tok.startswith("--"):
            raise ValueError(f"unexpected CLI token: {tok}")
        key = tok[2:].replace("-", "_")
        if key not in valid_keys:
            raise KeyError(f"WRONG ARG: {key}")
        current = getattr(cfg, key)
        if isinstance(current, list):
            vals = []
            i += 1
            while i < len(overrides) and not overrides[i].startswith("--"):
                vals.append(overrides[i])
                i += 1
            elem = current[0] if current else 0
            setattr(cfg, key, [_coerce(v, elem) for v in vals])
            continue
        if isinstance(current, dict):
            i += 1
            setattr(cfg, key, yaml.safe_load(overrides[i]))
            i += 1
            continue
        i += 1
        value = overrides[i]
        i += 1
        if current is None:
            setattr(cfg, key, value)
        else:
            setattr(cfg, key, _coerce(value, current))
    return cfg


def save_config(cfg: ExperimentConfig, path: str) -> None:
    with open(path, "w") as f:
        yaml.safe_dump(dataclasses.asdict(cfg), f, sort_keys=False)
