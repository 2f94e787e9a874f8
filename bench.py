"""Benchmark: flagship-model training throughput on the attached TPU.

Prints ONE JSON line:
  {"metric": "train_clips_per_sec", "value": N, "unit": "clips/s",
   "vs_baseline": N / 47.0, ..., "eval": {"metric": "eval_clips_per_sec",
   "value": N, "vs_baseline": N / 473.0, ...}}

The default run measures BOTH halves of the headline — the train step
(driver contract keys at top level) and the eval pass (nested record) —
so the driver artifact carries the full number without scratch logs.

Baselines (BASELINE.md): the reference trains ~47 clips/s and evals
~473 clips/s on one NVIDIA GPU (TRAINING_REPORT.md:278-284, :373).
Same workload shape here: MediaPipe fall-detection config, batch 64,
clips (3, 300, 33, 1); the train number is the full step (fwd + bwd +
SGD update + BN state update) including host->device transfer of each
batch.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


# --dataset shapes for the train/eval model benches: the MediaPipe fall
# workload (BASELINE.md) and the reference's original NTU-60 xsub matrix
# (config/nturgbd-cross-subject/train_joint.yaml: num_class 60, V=25, M=2)
_DATASET_ARGS = {
    "mediapipe": dict(num_class=2, num_point=33, num_person=1,
                      graph="mediapipe_pose"),
    "ntu": dict(num_class=60, num_point=25, num_person=2,
                graph="ntu_rgb_d"),
}


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--smoke", action="store_true",
                        help="tiny shapes / CPU-friendly quick check")
    parser.add_argument("--steps", type=int, default=20)
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument("--compute-dtype", default=None,
                        help="e.g. bfloat16 for matmul inputs")
    parser.add_argument("--activation-dtype", default="bfloat16",
                        help="whole-backbone activation dtype; 'bfloat16' "
                        "(default — the TPU-idiomatic mixed-precision mode: "
                        "params/BN-stats/optimizer fp32, +30%% train "
                        "throughput, convergence-parity-tested) or "
                        "'float32' for the exact-reference-precision path")
    parser.add_argument("--transfer-dtype", default="auto",
                        choices=["auto", "bfloat16", "float32"],
                        help="host->device batch dtype for the train "
                        "bench (mirrors the Trainer's transfer_dtype "
                        "knob): 'auto' = bfloat16 when activations are "
                        "bfloat16.  Halves the per-step transfer bytes "
                        "— the train-side bottleneck when the "
                        "interconnect is slow (probe44: median 392 vs "
                        "247 clips/s in a slow-relay period)")
    parser.add_argument("--dataset", default="mediapipe",
                        choices=["mediapipe", "ntu"],
                        help="train/eval modes: mediapipe fall config "
                        "(V=33, M=1, 2 classes — the BASELINE.md "
                        "workload, default) or the NTU-60 xsub shape "
                        "(V=25, M=2, 60 classes — the reference's "
                        "original benchmark matrix)")
    parser.add_argument("--devices", type=int, default=0,
                        help="scaling/edges modes: largest device count "
                        "to scale to (0 = all local devices). On a real "
                        "slice, pass the slice size")
    parser.add_argument("--strategy", default="gather",
                        choices=["gather", "ring"],
                        help="edge-partition exchange strategy for "
                        "--mode edges (gather: replicated nodes + psum; "
                        "ring: sharded nodes + ppermute pipeline)")
    parser.add_argument("--mode", default="train",
                        choices=["train", "eval", "spmm", "scaling",
                                 "edges", "fourstream", "io", "serve"],
                        help="train step clips/s with a nested eval "
                        "record (default), eval clips/s alone, "
                        "sparse-aggregation edges/s, data-parallel "
                        "scaling efficiency across the local mesh, "
                        "edge-partitioned aggregation scaling "
                        "(edges/s over 1..N devices), "
                        "concurrent four-stream training stream-clips/s, "
                        "or host input-pipeline clips/s (numpy mmap "
                        "gather vs the native C++ thread-pool loader)")
    args = parser.parse_args()
    if args.activation_dtype in ("float32", "fp32", "none", ""):
        args.activation_dtype = None
    if args.mode == "spmm":
        args.activation_dtype = None  # not a model bench

    if args.smoke:
        # --smoke is the quick correctness check: run it on host CPU so it
        # never waits on the remote TPU compile helper (TPU hardware smoke
        # is a separate step; see .claude/skills/verify).  Virtual devices
        # let the scaling/edges modes exercise real mesh code paths.
        import os

        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8").strip()
        import jax

        jax.config.update("jax_platforms", "cpu")
    if args.mode == "io":
        _bench_io(args)  # host-only: no device involved
        return
    if not args.smoke:
        _device_sanity_check()
    if args.mode == "spmm":
        _bench_spmm(args)
        return
    if args.mode == "eval":
        _bench_eval(args)
        return
    if args.mode == "scaling":
        _bench_scaling(args)
        return
    if args.mode == "edges":
        _bench_edges(args)
        return
    if args.mode == "fourstream":
        _bench_fourstream(args)
        return
    if args.mode == "serve":
        _bench_serve(args)
        return

    import jax
    import jax.numpy as jnp

    from shift_gcn_tpu.train.optim import build_weight_decay_tree
    from shift_gcn_tpu.train.state import create_train_state, make_train_step

    config, batch_size, t, steps = _bench_model_setup(args)

    from shift_gcn_tpu.train.transfer import (resolve_transfer_dtype,
                                              restore_batch_fp32)

    state = create_train_state(jax.random.key(0), config)
    wd_tree = build_weight_decay_tree(state.params)
    step_fn = make_train_step(config, wd_tree)

    # transfer dtype (the Trainer's shared policy, train/transfer.py):
    # batch ships compact, is cast back to fp32 on device
    transfer_np = resolve_transfer_dtype(args.transfer_dtype,
                                         config.activation_dtype)
    td = np.dtype(transfer_np).name
    if transfer_np is not np.float32:
        _inner = step_fn

        def step_fn(s, batch, lr_):
            return _inner(s, restore_batch_fp32(batch), lr_)
    train_step = jax.jit(step_fn, donate_argnums=(0,))

    rng = np.random.default_rng(0)
    host_batch = {
        "data": rng.standard_normal(
            (batch_size, 3, t, config.num_point, config.num_person)
        ).astype(transfer_np),
        "label": rng.integers(0, config.num_class, batch_size).astype(np.int32),
    }
    lr = jnp.asarray(0.1, jnp.float32)

    # warmup / compile
    for _ in range(2):
        batch = jax.device_put(host_batch)
        state, metrics = train_step(state, batch, lr)
    jax.block_until_ready(metrics)

    # Host->device transfers run on a prefetch thread, double-buffered
    # against the device step (device_put through this platform's socket
    # relay blocks the calling thread; a real input pipeline overlaps the
    # copy with compute, so the bench does too — every batch is still
    # transferred inside the timed region).
    #
    # The reported number is the MEDIAN of 3 timed windows: controlled
    # A/Bs (probes 35/36, docs/PERF.md) show this platform's socket relay
    # injects episodic multi-second stalls that can depress a single
    # window 15-40% while adjacent windows are clean — a robust statistic
    # over windows measures the program, not the relay's worst moment.
    # All window readings are reported in the JSON.
    from concurrent.futures import ThreadPoolExecutor

    reps = []
    windows = 1 if args.smoke else 3
    # keep attempting until the full median-of-`windows` protocol is met
    # (zombie-worker readings don't count); if the retry budget runs out
    # with >=1 clean window the JSON carries a windows_short flag rather
    # than silently reporting a median of fewer windows
    for attempt in range(windows + 4):
        with ThreadPoolExecutor(max_workers=1) as pool:
            t0 = time.perf_counter()
            pending = pool.submit(jax.device_put, host_batch)
            for _ in range(steps):
                batch = pending.result()
                pending = pool.submit(jax.device_put, host_batch)
                state, metrics = train_step(state, batch, lr)
            jax.block_until_ready(metrics)
            dt = time.perf_counter() - t0
        clips_per_sec = steps * batch_size / dt
        # a full train step on one chip cannot plausibly exceed ~3000
        # clips/s — faster readings mean the zombie-worker no-op mode
        if not args.smoke and clips_per_sec >= 3000:
            print(f"# implausible throughput {clips_per_sec:.0f} clips/s; "
                  "re-checking device", flush=True)
            _device_sanity_check()
            continue
        reps.append(clips_per_sec)
        if len(reps) >= windows:
            break
    if not reps:
        # every window read as a zombie no-op and in-process sanity
        # checks kept "passing": the established recovery is a fresh
        # process (new worker claim), not emitting NaN JSON
        _reexec_fresh_process()
    clips_per_sec = float(np.median(reps))
    # reference train baseline: 47 clips/s is the MediaPipe fall workload
    # (BASELINE.md); the fork publishes no NTU-mode throughput, so that
    # shape reports vs_baseline null (not a ratio against the wrong
    # workload's number, and not a 0 that reads as "measured 0x")
    base = 47.0 if args.dataset == "mediapipe" else None
    record = {
        "metric": "train_clips_per_sec",
        "value": round(clips_per_sec, 2),
        "unit": "clips/s",
        "vs_baseline": round(clips_per_sec / base, 2) if base else None,
        "baseline_source": ("reference GPU 47 clips/s (BASELINE.md)"
                            if base else "unpublished"),
        "dataset": args.dataset,
        "transfer_dtype": td,
        "window_reps": [round(r, 1) for r in reps],
        "roofline": _roofline(config, t, batch_size,
                              batch_size / clips_per_sec, train=True),
    }
    if len(reps) < windows:
        record["windows_short"] = True
    # the other half of the headline: the eval pass, same dataset/dtype
    # knobs, nested so the driver's one-line artifact carries both medians
    # (VERDICT r4 task 3; previously eval lived only in scratch logs)
    record["eval"] = _eval_record(args)
    print(json.dumps(record))


def _bench_model_setup(args):
    """(config, batch_size, T, steps) shared by the train bench and the
    nested eval record — ONE definition of the smoke/full shapes so the
    two halves of the default JSON can never desynchronize."""
    from shift_gcn_tpu.models.shift_gcn import BlockSpec, ModelConfig

    if args.smoke:
        config = ModelConfig(
            num_class=2, num_point=25, num_person=1, graph="ntu_rgb_d",
            blocks=(BlockSpec(3, 8, residual=False),
                    BlockSpec(8, 16, stride=2)),
            compute_dtype=args.compute_dtype,
            activation_dtype=args.activation_dtype)
        return config, 8, 32, 3
    config = ModelConfig(
        compute_dtype=args.compute_dtype,
        activation_dtype=args.activation_dtype,
        **_DATASET_ARGS[args.dataset])
    return config, args.batch_size, 300, args.steps


def _roofline(config, t: int, batch_size: int, step_seconds: float,
              *, train: bool = True):
    """Quantify the speed-of-light claim: algorithmic FLOPs + a lower-bound
    HBM byte count per step vs TPU v5e peaks (197 TFLOP/s bf16, 819 GB/s).

    FLOPs count the *useful* matmul work only (spatial pointwise, temporal
    1x1, residual/down convs, classifier; 2 MAC = 2 FLOP), not the
    lowering overhead (DFT basis matmuls, circulant dead lanes) — so MFU
    here is an honest algorithmic-efficiency number, and bandwidth_util
    tells the bound that actually binds (the model is activation-traffic
    dominated).  Backward ~= 2x forward FLOPs; SGD/BN elementwise ignored.
    """
    v = config.num_point
    m = config.num_person
    act_bytes = 2 if config.activation_dtype else 4
    flops = 0.0
    acts = 0.0  # activation elements materialized across the forward
    t_cur = t
    for spec in config.blocks:
        cin, cout = spec.in_channels, spec.out_channels
        flops += 2.0 * t_cur * v * cin * cout          # spatial matmul
        if cin != cout:
            flops += 2.0 * t_cur * v * cin * cout      # gcn down conv
        flops += 2.0 * t_cur * v * cout * cout         # temporal 1x1
        if spec.residual and (cin != cout or spec.stride != 1):
            flops += 2.0 * (t_cur // spec.stride) * v * cin * cout
        flops += 2.0 * 2 * t_cur * v * cout            # 2 shifts, O(T V C)
        acts += 6.0 * t_cur * v * cout                 # per-op outputs
        t_cur //= spec.stride
    flops *= m   # blocks run per person; the classifier (below) does not
    acts *= m
    flops += 2.0 * config.blocks[-1].out_channels * config.num_class
    if train:
        flops *= 3.0  # fwd + ~2x bwd
    # param traffic: read in fwd + read in bwd + grad write + 2x optimizer
    # (momentum read/write), all fp32
    from shift_gcn_tpu.models.shift_gcn import init_params, param_count

    p, _ = init_params(__import__("jax").random.key(0), config)
    params = param_count(p)
    # HBM lower bound: each forward activation written once + read once by
    # the next op; backward re-reads (or remats) and writes cotangents —
    # ~4 passes total in training, 2 in eval
    passes = 4.0 if train else 2.0
    bytes_per_clip = acts * act_bytes * passes
    bytes_per_step = bytes_per_clip * batch_size + params * 4 * (
        5 if train else 1)
    flops_per_step = flops * batch_size
    peak_flops = 197e12 if (config.activation_dtype
                            or config.compute_dtype) else 197e12 / 4
    peak_bw = 819e9
    return {
        "model_gflops_per_clip": round(flops / 1e9, 3),
        "mfu": round(flops_per_step / step_seconds / peak_flops, 4),
        "hbm_gb_per_step_lower_bound": round(bytes_per_step / 1e9, 3),
        "bandwidth_util": round(
            bytes_per_step / step_seconds / peak_bw, 3),
    }


def _timeit(fn, *args, steps=20):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / steps


def _device_sanity_check(max_tries=3, wait_s=30):
    """Verify the accelerator actually computes (this platform's remote TPU
    worker can enter a zombie state where executions no-op instantly and
    return garbage).  The zombie state is per-connection: in-process
    retries don't heal it, so after a few failed attempts the whole bench
    re-execs itself in a fresh process (which establishes a new worker
    claim), up to _MAX_REEXEC times."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(1234)
    for attempt in range(max_tries):
        a = rng.standard_normal((128, 128)).astype(np.float32)
        b = rng.standard_normal((128, 128)).astype(np.float32)
        want = a @ b
        try:
            # precision="highest": the check must not depend on the
            # platform's default matmul precision (a default-bf16 backend
            # fails atol=1e-2 and masquerades as a zombie worker)
            got = np.asarray(jnp.matmul(
                jnp.asarray(a), jnp.asarray(b), precision="highest"))
            if np.allclose(got, want, atol=1e-2):
                return
            print(f"# device sanity check failed numerics "
                  f"(attempt {attempt + 1}); waiting", flush=True)
        except Exception as e:  # worker restarting
            print(f"# device error: {type(e).__name__} "
                  f"(attempt {attempt + 1}); waiting", flush=True)
        time.sleep(wait_s)
    _reexec_fresh_process()


_MAX_REEXEC = 8


def _reexec_fresh_process():
    """Re-run this bench in a new interpreter (fresh TPU connection)."""
    import os
    import subprocess
    import sys

    depth = int(os.environ.get("_SGT_BENCH_REEXEC", "0"))
    if depth >= _MAX_REEXEC:
        raise RuntimeError(
            "accelerator failed sanity checks after "
            f"{_MAX_REEXEC} fresh-process retries; aborting bench")
    print(f"# re-executing bench in a fresh process "
          f"(retry {depth + 1}/{_MAX_REEXEC})", flush=True)
    time.sleep(90)
    env = dict(os.environ)
    env["_SGT_BENCH_REEXEC"] = str(depth + 1)
    result = subprocess.run([sys.executable] + sys.argv, env=env)
    sys.exit(result.returncode)


def _eval_record(args):
    """Eval-pass throughput record (reference baseline: ~473 clips/s,
    TRAINING_REPORT.md:373).  Printed alone by --mode eval and nested
    under the default train record's "eval" key."""
    import jax
    import jax.numpy as jnp

    from shift_gcn_tpu.models.shift_gcn import apply, init_params

    config, batch_size, t, steps = _bench_model_setup(args)
    params, state = init_params(jax.random.key(0), config)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(
        (batch_size, 3, t, config.num_point,
         config.num_person)), jnp.float32)
    fwd = jax.jit(lambda p, s, xx: apply(p, s, xx, config,
                                         training=False)[0])
    # median of 3 windows, same relay-stall rationale as the train bench
    windows = 1 if args.smoke else 3
    dts = [_timeit(fwd, params, state, x, steps=steps)
           for _ in range(windows)]
    sec_per_batch = float(np.median(dts))
    clips = batch_size / sec_per_batch
    # 473 clips/s is the MediaPipe-workload eval baseline (BASELINE.md);
    # no NTU-mode number is published
    base = 473.0 if args.dataset == "mediapipe" else None
    return {
        "metric": "eval_clips_per_sec",
        "value": round(clips, 2),
        "unit": "clips/s",
        "vs_baseline": round(clips / base, 2) if base else None,
        "baseline_source": ("reference GPU 473 clips/s (BASELINE.md)"
                            if base else "unpublished"),
        "dataset": args.dataset,
        "window_reps": [round(batch_size / d, 1) for d in dts],
        "roofline": _roofline(config, t, batch_size, sec_per_batch,
                              train=False),
    }


def _bench_eval(args):
    print(json.dumps(_eval_record(args)))


def _bench_spmm(args):
    """Edges/s of the batched dense-subset graph aggregation (the generic
    message-passing kernel; no published reference number -> vs_baseline
    reported as null)."""
    import jax
    import jax.numpy as jnp

    from shift_gcn_tpu.graphs import MEDIAPIPE_POSE
    from shift_gcn_tpu.ops.aggregate import dense_graph_aggregate

    graph = MEDIAPIPE_POSE
    b, c = 4096, 64
    edges = int((graph.A != 0).sum())
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, graph.num_nodes, c)),
                    jnp.float32)
    adj = jnp.asarray(graph.A)
    agg = jax.jit(lambda xx: dense_graph_aggregate(xx, adj))
    dt = _timeit(agg, x, steps=args.steps)
    edges_per_sec = b * edges / dt
    print(json.dumps({
        "metric": "spmm_edges_per_sec",
        "value": round(edges_per_sec / 1e9, 3),
        "unit": "Gedge/s",
        "vs_baseline": None,
        "baseline_source": "unpublished",
    }))


def _bench_fourstream(args):
    """Concurrent four-stream training throughput in stream-clips/s (one
    clip trained through all four modality models counts as 4).  The
    reference covers the same workload as four sequential ~47 clips/s runs,
    so vs_baseline is against 47 stream-clips/s."""
    import jax
    import jax.numpy as jnp

    from shift_gcn_tpu.graphs import get_graph
    from shift_gcn_tpu.models.shift_gcn import ModelConfig
    from shift_gcn_tpu.train import fourstream as fs
    from shift_gcn_tpu.train.optim import build_weight_decay_tree

    config = ModelConfig(
        num_class=2, num_point=33, num_person=1, graph="mediapipe_pose",
        compute_dtype=args.compute_dtype,
        activation_dtype=args.activation_dtype)
    graph = get_graph(config.graph)
    state4 = fs.create_fourstream_state(jax.random.key(0), config)
    wd = build_weight_decay_tree(
        jax.tree_util.tree_map(lambda x: x[0], state4.params))
    from shift_gcn_tpu.train.transfer import (resolve_transfer_dtype,
                                              restore_batch_fp32)

    step_fn = fs.make_fourstream_train_step(config, wd, graph)
    # transfer dtype: the Trainer's shared policy (train/transfer.py)
    transfer_np = resolve_transfer_dtype(args.transfer_dtype,
                                         config.activation_dtype)
    if transfer_np is not np.float32:
        _inner4 = step_fn

        def step_fn(s, batch, lr_):
            return _inner4(s, restore_batch_fp32(batch), lr_)
    step = jax.jit(step_fn, donate_argnums=(0,))
    rng = np.random.default_rng(0)
    host_batch = {
        "data": rng.standard_normal(
            (args.batch_size, 3, 300, 33, 1)).astype(transfer_np),
        "label": rng.integers(0, 2, args.batch_size).astype(np.int32),
    }
    lr = jnp.asarray(0.1, jnp.float32)
    for _ in range(2):
        state4, metrics = step(state4, jax.device_put(host_batch), lr)
    jax.block_until_ready(metrics)
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=1) as pool:
        t0 = time.perf_counter()
        pending = pool.submit(jax.device_put, host_batch)
        for _ in range(args.steps):
            batch = pending.result()
            pending = pool.submit(jax.device_put, host_batch)
            state4, metrics = step(state4, batch, lr)
        jax.block_until_ready(metrics)
        dt = time.perf_counter() - t0
    stream_clips = args.steps * args.batch_size * len(fs.STREAMS) / dt
    print(json.dumps({
        "metric": "fourstream_stream_clips_per_sec",
        "value": round(stream_clips, 2),
        "unit": "stream-clips/s",
        "vs_baseline": round(stream_clips / 47.0, 2),
        "baseline_source": "reference GPU 47 stream-clips/s (BASELINE.md)",
    }))


def _scaling_substrate(devices, sizes):
    """Classify what a scaling efficiency number measured on these devices
    actually means.  Only a real multi-chip accelerator slice measures ICI
    scaling; one chip or virtual CPU devices exercise the code path
    (harness smoke), not the target metric."""
    platform = devices[0].platform
    if platform == "cpu":
        return "virtual-cpu", True
    if sizes[-1] < 2 or len({d.id for d in devices[:sizes[-1]]}) < 2:
        return f"single-{platform}-chip", True
    return f"{platform}-slice", False


def _bench_edges(args):
    """North-star measurement (BASELINE.json): edges/s of the
    edge-partitioned aggregation, weak-scaled over 1..N devices, reported
    as efficiency vs this run's own 1-device baseline.

    Many clips' skeleton graphs are batched into ONE block-diagonal sparse
    problem (B disjoint copies of the NTU spatial graph -> B*E edges over
    B*V nodes); the combined edge list is partitioned across the mesh and
    each device segment-sums its slice + psums partials
    (parallel/edge_partition.py).  Weak scaling: clips (and so edges)
    grow with the device count, per-device edge work held constant.

    Protocol for the real measurement (the >=85% target): run on a TPU
    slice whose chips share an ICI domain (v5e-8 or larger; the mesh axis
    must ride ICI, not DCN), ``--devices <slice size>``; the JSON's
    ``substrate`` field then reads ``tpu-slice`` and ``harness_smoke``
    false.  Any other substrate (one chip, virtual CPU devices) exercises
    the code path only and is labeled harness_smoke: true.
    """
    import jax
    from jax.sharding import Mesh

    from shift_gcn_tpu.graphs import NTU_RGB_D
    from shift_gcn_tpu.parallel.edge_partition import make_sharded_aggregator

    devices = jax.devices()
    n_max = min(len(devices), args.devices) if args.devices else len(devices)
    sizes = [s for s in (1, 2, 4, 8, 16, 32, 64, 128, 256) if s <= n_max]
    per_dev_clips = 16 if args.smoke else 512
    c = 16 if args.smoke else 64
    graph = NTU_RGB_D
    coo = graph.coo()
    v = graph.num_nodes
    e = len(coo["src"])
    rng = np.random.default_rng(0)

    eps = {}
    for n in sizes:
        b = per_dev_clips * n
        # block-diagonal batched graph: clip i's copy occupies nodes
        # [i*V, (i+1)*V)
        off = (np.arange(b, dtype=np.int64)[:, None] * v)
        edges = {
            "src": (coo["src"][None, :] + off).reshape(-1).astype(np.int32),
            "dst": (coo["dst"][None, :] + off).reshape(-1).astype(np.int32),
            "weight": np.tile(coo["weight"], b).astype(np.float32),
        }
        mesh = Mesh(np.asarray(devices[:n]), ("model",))
        agg = make_sharded_aggregator(edges, b * v, mesh, "model",
                                      strategy=args.strategy)
        x = rng.standard_normal((1, b * v, c)).astype(np.float32)
        import jax.numpy as jnp

        xd = jnp.asarray(x)
        dt = _timeit(agg, xd, steps=max(3, args.steps // 2))
        eps[n] = b * e / dt

    top = sizes[-1]
    efficiency = eps[top] / (eps[sizes[0]] * top)
    substrate, smoke = _scaling_substrate(devices, sizes)
    print(json.dumps({
        "metric": f"edge_scaling_efficiency_{top}x",
        "value": round(efficiency, 3),
        "unit": "fraction",
        "vs_baseline": round(efficiency / 0.85, 2),
        "baseline_source": "BASELINE.json north-star: >=0.85 efficiency",
        "strategy": args.strategy,
        "substrate": substrate,
        "harness_smoke": smoke,
        "edges_per_sec": {str(k): round(val, 0) for k, val in eps.items()},
    }))


def _bench_serve(args):
    """Serving-path throughput/latency: both AOT StableHLO artifact
    flavors (inference/export.py), serialize->deserialize round-tripped
    as a serving host would load them.

    Headline value = pipelined throughput of the params-as-inputs
    flavor (the recommended one: weights as ARGUMENTS run at live-jit
    speed, while weights-as-CONSTANTS executables lose ~17% — probe50);
    the baked flavor's throughput and a synchronous per-request p50/p95
    latency are reported alongside, plus live jit as the control."""
    import jax
    import jax.numpy as jnp

    from shift_gcn_tpu.models.shift_gcn import (ModelConfig, apply,
                                                init_params)
    from shift_gcn_tpu.inference.export import (export_eval,
                                                export_eval_baked,
                                                load_exported)

    if args.smoke:
        config = ModelConfig(
            num_class=2, num_point=25, num_person=1, graph="ntu_rgb_d",
            activation_dtype=args.activation_dtype,
            compute_dtype=args.compute_dtype)
        batch_size, seq_len, iters = 4, 64, 3
    else:
        config = ModelConfig(
            activation_dtype=args.activation_dtype,
            compute_dtype=args.compute_dtype,
            **_DATASET_ARGS[args.dataset])
        batch_size, seq_len, iters = args.batch_size, 300, 30
    params, bn_state = init_params(jax.random.key(0), config)
    blob_inputs = export_eval(params, bn_state, config, batch_size,
                              seq_len)
    blob_baked = export_eval_baked(params, bn_state, config, batch_size,
                                   seq_len)
    call_inputs = jax.jit(load_exported(blob_inputs).call)
    call_baked = jax.jit(load_exported(blob_baked).call)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(
        (batch_size, config.in_channels, seq_len, config.num_point,
         config.num_person)), jnp.float32)

    dt_inputs = _timeit(call_inputs, params, bn_state, x, steps=iters)
    dt_baked = _timeit(call_baked, x, steps=iters)
    live = jax.jit(lambda p, s, xx: apply(p, s, xx, config,
                                          training=False)[0])
    dt_live = _timeit(live, params, bn_state, x, steps=iters)
    # synchronous per-request latency (no dispatch pipelining) on the
    # recommended flavor
    lats = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(call_inputs(params, bn_state, x))
        lats.append(time.perf_counter() - t0)
    lats = np.sort(np.asarray(lats))
    clips = batch_size / dt_inputs
    # 473 is the MediaPipe-workload eval baseline; no NTU number exists
    base = 473.0 if args.dataset == "mediapipe" else None
    print(json.dumps({
        "metric": "serve_clips_per_sec",
        "value": round(clips, 2),
        "unit": "clips/s",
        "vs_baseline": round(clips / base, 2) if base else None,
        "baseline_source": ("reference GPU 473 clips/s (BASELINE.md)"
                            if base else "unpublished"),
        "dataset": args.dataset,
        "flavor": "params-as-inputs",
        "artifact_bytes": {"inputs": len(blob_inputs),
                           "baked": len(blob_baked)},
        "baked_clips_per_sec": round(batch_size / dt_baked, 2),
        "live_jit_clips_per_sec": round(batch_size / dt_live, 2),
        "sync_batch_latency_ms": {
            "p50": round(float(np.median(lats)) * 1e3, 2),
            "p95": round(float(lats[int(0.95 * (len(lats) - 1))]) * 1e3,
                         2),
        },
    }))


def _bench_io(args):
    """Host input-pipeline throughput: random-batch clip gather from a
    production-shaped mmap'd .npy, numpy fancy-indexing vs the native C++
    thread-pool loader (native/sgt_loader.cpp), including one
    prefetch-overlapped pass for the native path (its async mode — the
    shape BatchIterator uses in training).  Host-only; the device is
    never touched.  The number that matters operationally: host clips/s
    must exceed device train clips/s (~400 on one v5e) or the input
    pipeline becomes the bottleneck."""
    import tempfile

    n, t, v, m = (64, 32, 33, 1) if args.smoke else (2048, 300, 33, 1)
    batch = 8 if args.smoke else args.batch_size
    n_batches = 4 if args.smoke else 32
    rng = np.random.default_rng(0)
    with tempfile.TemporaryDirectory() as tmp:
        path = f"{tmp}/io_bench.npy"
        np.save(path, rng.standard_normal(
            (n, 3, t, v, m)).astype(np.float32))
        data = np.load(path, mmap_mode="r")
        order = rng.integers(0, n, (n_batches, batch))

        def numpy_pass():
            t0 = time.perf_counter()
            for i in range(n_batches):
                np.ascontiguousarray(data[order[i]])
            return n_batches * batch / (time.perf_counter() - t0)

        numpy_cps = max(numpy_pass() for _ in range(3))

        native_cps = native_async_cps = None
        loader = None
        try:
            from shift_gcn_tpu.data.native_loader import NativeClipLoader

            loader = NativeClipLoader(path)

            def native_pass():
                t0 = time.perf_counter()
                for i in range(n_batches):
                    loader.gather(order[i].astype(np.int64))
                return n_batches * batch / (time.perf_counter() - t0)

            def native_async_pass():
                # double-buffered: prefetch batch i+1 while "consuming" i
                t0 = time.perf_counter()
                loader.prefetch(order[0].astype(np.int64))
                for i in range(n_batches):
                    got = loader.wait()
                    if i + 1 < n_batches:
                        loader.prefetch(order[i + 1].astype(np.int64))
                    assert got.shape[0] == batch
                return n_batches * batch / (time.perf_counter() - t0)

            native_cps = max(native_pass() for _ in range(3))
            native_async_cps = max(native_async_pass() for _ in range(3))
        except Exception as e:
            stage = ("unavailable" if loader is None
                     else "ran but failed partway")
            print(f"# native loader {stage}: {type(e).__name__}: "
                  f"{e}", flush=True)
        finally:
            if loader is not None:
                loader.close()

        best = max(x for x in (numpy_cps, native_cps, native_async_cps)
                   if x is not None)
        print(json.dumps({
            "metric": "io_clips_per_sec",
            "value": round(best, 1),
            "unit": "clips/s",
            # operational bar: feed the ~400 clips/s device train step
            "vs_baseline": round(best / 400.0, 2),
            "baseline_source": "operational bar: ~400 clips/s device step",
            "numpy_mmap": round(numpy_cps, 1),
            "native_gather": (round(native_cps, 1)
                              if native_cps is not None else None),
            "native_prefetch": (round(native_async_cps, 1)
                                if native_async_cps is not None else None),
        }))


def _bench_scaling(args):
    """Data-parallel scaling efficiency: clips/s at mesh sizes 1..N with
    per-device batch held constant (weak scaling), vs this run's own
    1-device baseline.  Only meaningful on a real multi-chip slice
    (``--devices <slice size>``); elsewhere the JSON labels itself
    ``harness_smoke: true`` — the code path runs, the metric doesn't."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from shift_gcn_tpu.models.shift_gcn import BlockSpec, ModelConfig
    from shift_gcn_tpu.train.optim import build_weight_decay_tree
    from shift_gcn_tpu.train.state import create_train_state, make_train_step

    devices = jax.devices()
    n_max = min(len(devices), args.devices) if args.devices else len(devices)
    sizes = [s for s in (1, 2, 4, 8, 16, 32, 64, 128, 256) if s <= n_max]
    per_device_batch = 8
    config = ModelConfig(
        num_class=2, num_point=25, num_person=1, graph="ntu_rgb_d",
        blocks=(BlockSpec(3, 16, residual=False),
                BlockSpec(16, 32, stride=2)))
    state = create_train_state(jax.random.key(0), config)
    wd = build_weight_decay_tree(state.params)
    step_fn = make_train_step(config, wd)
    rng = np.random.default_rng(0)
    lr = jnp.asarray(0.1, jnp.float32)

    throughput = {}
    for n in sizes:
        mesh = Mesh(np.asarray(devices[:n]), ("data",))
        shard = NamedSharding(mesh, P("data"))
        b = per_device_batch * n
        batch = {
            "data": jax.device_put(rng.standard_normal(
                (b, 3, 64, 25, 1)).astype(np.float32), shard),
            "label": jax.device_put(
                rng.integers(0, 2, b).astype(np.int32), shard),
        }
        step = jax.jit(step_fn)
        dt = _timeit(lambda s, bb: step(s, bb, lr)[1]["loss"],
                     state, batch, steps=args.steps)
        throughput[n] = b / dt

    base = throughput[sizes[0]]
    top = sizes[-1]
    efficiency = throughput[top] / (base * top)
    substrate, smoke = _scaling_substrate(devices, sizes)
    print(json.dumps({
        "metric": f"dp_scaling_efficiency_{top}x",
        "value": round(efficiency, 3),
        "unit": "fraction",
        "vs_baseline": round(efficiency / 0.85, 2),
        "baseline_source": "BASELINE.json north-star: >=0.85 efficiency",
        "substrate": substrate,
        "harness_smoke": smoke,
        "clips_per_sec": {str(k): round(v, 1)
                          for k, v in throughput.items()},
    }))


if __name__ == "__main__":
    main()
