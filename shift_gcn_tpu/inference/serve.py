"""Batch scoring from an exported StableHLO artifact.

Serving counterpart of ``inference/export.py``: no model code, no
checkpoint restore — just the serialized artifact and XLA.  Reads a `.npy`
of pre-normalized clips in the feeder layout ``(N, C, T, V, M)``, scores
them through the artifact in fixed-size batches (the artifact's
compiled batch size; the tail is zero-padded and stripped), and writes
logits as `.npy`.  Baked artifacts are self-contained; params-as-inputs
artifacts (exported with ``--no-baked``, ~17% faster) take a
``--weights`` checkpoint dir.

    python -m shift_gcn_tpu.inference.serve --artifact model.shlo \
        --data val_data_joint.npy --out scores.npy --batch-size 64
"""

from __future__ import annotations

import json

import numpy as np


def score_clips(artifact, data: np.ndarray, batch_size: int,
                weights=None) -> np.ndarray:
    """Run (N, C, T, V, M) clips through the artifact in fixed batches.

    ``weights``: (params, bn_state) for the params-as-inputs flavor (the
    faster, hot-swappable one — export.py module docstring); None for
    baked artifacts."""
    import jax
    import jax.numpy as jnp

    call = jax.jit(artifact.call)
    n = data.shape[0]
    outs = []
    for start in range(0, n, batch_size):
        chunk = data[start:start + batch_size]
        pad = batch_size - chunk.shape[0]
        if pad:
            chunk = np.concatenate(
                [chunk, np.zeros((pad,) + chunk.shape[1:], chunk.dtype)])
        x = jnp.asarray(chunk, jnp.float32)
        out = call(*weights, x) if weights is not None else call(x)
        logits = np.asarray(out)
        outs.append(logits[:batch_size - pad])
    return np.concatenate(outs) if outs else np.zeros((0,))


def artifact_is_baked(artifact) -> bool:
    """Baked artifacts take exactly one input (the clip batch)."""
    return len(artifact.in_avals) == 1


def main(argv=None):
    import argparse

    from shift_gcn_tpu.inference.export import load_exported

    parser = argparse.ArgumentParser(
        description="score clips with an exported StableHLO artifact")
    parser.add_argument("--artifact", required=True)
    parser.add_argument("--data", required=True,
                        help=".npy of (N, C, T, V, M) pre-normalized clips")
    parser.add_argument("--out", required=True, help="output scores .npy")
    parser.add_argument("--batch-size", type=int, default=64,
                        help="must match the artifact's compiled batch size")
    parser.add_argument("--weights", default=None,
                        help="checkpoint dir for params-as-inputs "
                        "artifacts (exported with --no-baked; ~17% "
                        "faster than baked — export.py docstring)")
    args = parser.parse_args(argv)

    with open(args.artifact, "rb") as f:
        artifact = load_exported(f.read())
    weights = None
    if not artifact_is_baked(artifact):
        if args.weights is None:
            raise SystemExit(
                "this artifact takes weights as inputs (exported with "
                "--no-baked); pass --weights <checkpoint dir>")
        # the artifact's own in_avals are the restore template, so ANY
        # architecture serves without passing model flags here
        from shift_gcn_tpu.inference.export import (
            restore_weights_for_artifact)

        weights = restore_weights_for_artifact(args.weights, artifact)
    data = np.load(args.data, mmap_mode="r")
    scores = score_clips(artifact, data, args.batch_size, weights=weights)
    np.save(args.out, scores)
    print(json.dumps({"clips": int(scores.shape[0]),
                      "classes": int(scores.shape[-1]),
                      "out": args.out}))


if __name__ == "__main__":
    main()
