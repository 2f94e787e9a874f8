"""Checkpoint save/restore via Orbax.

TPU-native equivalent of the reference torch.save checkpoint dict
(main.py:436-448): the full train-state pytree (params, BN state, optimizer
momentum) plus {epoch, global_step, best_acc} metadata, written atomically,
with resume and best-checkpoint retention.  Also provides a torch->pytree
converter so reference checkpoints can be imported.
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp


def save_checkpoint(directory: str, step: int, payload: Any) -> str:
    """Save `payload` pytree under directory/step. Returns the path."""
    path = os.path.abspath(os.path.join(directory, str(step)))
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, payload, force=True)
    return path


def restore_checkpoint(path: str, template: Any) -> Any:
    """Restore a pytree saved by save_checkpoint, shaped like `template`."""
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(path), template)


def latest_checkpoint(directory: str) -> Optional[str]:
    """Highest-step checkpoint dir, mirroring the reference's max-epoch
    auto-detect (inference_pipeline.py:28-38)."""
    if not os.path.isdir(directory):
        return None
    steps = [d for d in os.listdir(directory) if re.fullmatch(r"\d+", d)]
    if not steps:
        return None
    return os.path.join(directory, max(steps, key=int))


# ---------------------------------------------------------------------------
# Reference (torch) checkpoint import
# ---------------------------------------------------------------------------

_BN_STATE_KEYS = ("running_mean", "running_var", "num_batches_tracked")


def torch_state_dict_to_pytrees(
    state_dict: Dict[str, "np.ndarray"],
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Split a reference torch state_dict into (params, bn_state) pytrees.

    Keys are dotted names like ``l1.gcn1.Linear_weight`` or
    ``l1.tcn1.bn.running_mean``; torch tensor values must already be numpy.
    The pytree structure matches models.shift_gcn.init_params, with two
    translations:
      - ``down.0/down.1`` (torch Sequential) -> ``down.conv`` / ``down.bn``
      - ``residual.conv/bn`` keep their names.
      - Linear_weight is stored (C_in, C_out) in both.
    """
    params: Dict[str, Any] = {}
    bn_state: Dict[str, Any] = {}

    def insert(tree: Dict[str, Any], parts, value):
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value

    for key, value in state_dict.items():
        parts = key.split(".")
        # torch Sequential indices in the gcn down path: 0=conv, 1=bn
        parts = ["conv" if p == "0" else "bn" if p == "1" else p
                 for p in parts]
        arr = np.asarray(value)
        if parts[-1] in _BN_STATE_KEYS:
            if parts[-1] == "num_batches_tracked":
                arr = arr.astype(np.int32)
            insert(bn_state, parts, arr)
        else:
            insert(params, parts, arr)
    return params, bn_state


def load_reference_checkpoint(path: str):
    """Load a reference ``.pt``/``.pkl`` checkpoint and return
    (params, bn_state) numpy pytrees plus metadata.

    ``.pkl`` weights (reference: main.py:264-266) load via pickle; ``.pt``
    via torch (required on the import host only)."""
    if path.endswith(".pkl"):
        import pickle

        with open(path, "rb") as f:
            blob = pickle.load(f)
    else:
        import torch

        blob = torch.load(path, map_location="cpu", weights_only=False)
    meta = {}
    if isinstance(blob, dict) and "model_state_dict" in blob:
        meta = {k: blob[k] for k in ("epoch", "global_step", "best_acc")
                if k in blob}
        blob = blob["model_state_dict"]
    def to_numpy(v):
        if hasattr(v, "detach"):
            return v.detach().cpu().numpy()
        return np.asarray(v)

    state_dict = {
        k.split("module.")[-1]: to_numpy(v) for k, v in blob.items()
    }
    params, bn_state = torch_state_dict_to_pytrees(state_dict)
    return params, bn_state, meta


# ---------------------------------------------------------------------------
# Reference (torch) checkpoint export
# ---------------------------------------------------------------------------


def pytrees_to_torch_state_dict(
    params: Dict[str, Any],
    bn_state: Dict[str, Any],
) -> Dict[str, np.ndarray]:
    """Inverse of `torch_state_dict_to_pytrees`: flatten (params,
    bn_state) into a reference-named torch state_dict (numpy values).

    Translations applied so the result `load_state_dict`s into the
    reference model (model/shift_gcn.py) strict:
      - gcn ``down.conv`` / ``down.bn`` -> Sequential ``down.0`` /
        ``down.1`` indices,
      - the Shift_gcn ``shift_in`` / ``shift_out`` index buffers
        (registered non-trainable Parameters in the reference,
        model/shift_gcn.py:108-118) are REGENERATED from each block's
        (V, C_in, C_out) — they are deterministic functions of shape,
        never trained, and our pytrees do not carry them.
    """
    flat: Dict[str, np.ndarray] = {}

    def walk(tree, prefix=""):
        for k, v in tree.items():
            if isinstance(v, dict):
                walk(v, f"{prefix}{k}.")
            else:
                flat[prefix + k] = np.asarray(v)

    walk(params)
    walk(bn_state)

    out: Dict[str, np.ndarray] = {}
    for key, value in flat.items():
        parts = key.split(".")
        if "down" in parts:
            i = parts.index("down")
            if i + 1 < len(parts) and parts[i + 1] in ("conv", "bn"):
                parts[i + 1] = "0" if parts[i + 1] == "conv" else "1"
        if parts[-1] == "num_batches_tracked":
            value = value.astype(np.int64)  # torch BN counters are long
        out[".".join(parts)] = value

    # regenerate the per-block spatial-shift index buffers
    for key in list(out):
        if key.endswith(".Linear_weight"):
            prefix = key[: -len("Linear_weight")]
            cin, cout = out[key].shape
            v = out[prefix + "Feature_Mask"].shape[1]
            idx_in = np.array(
                [(i * cin + j + j * cin) % (cin * v)
                 for i in range(v) for j in range(cin)], dtype=np.int64)
            idx_out = np.array(
                [(i * cout + j - j * cout) % (cout * v)
                 for i in range(v) for j in range(cout)], dtype=np.int64)
            out[prefix + "shift_in"] = idx_in
            out[prefix + "shift_out"] = idx_out
    return out


def export_reference_checkpoint(
    path: str,
    params: Dict[str, Any],
    bn_state: Dict[str, Any],
    meta: Optional[Dict[str, Any]] = None,
) -> str:
    """Write a reference-compatible torch checkpoint.

    Without ``meta``: a bare state_dict — the format the reference's
    ``--weights`` path loads (main.py:261-292).  With ``meta`` (epoch /
    global_step / best_acc): the full resume dict (main.py:436-448).
    """
    import torch

    state_dict = {
        k: torch.as_tensor(v.copy())
        for k, v in pytrees_to_torch_state_dict(params, bn_state).items()
    }
    payload: Any = state_dict
    if meta:
        payload = {"model_state_dict": state_dict, **meta}
    torch.save(payload, path)
    return path


def _main() -> None:
    """CLI: convert an Orbax trainer checkpoint to a reference .pt.

    python -m shift_gcn_tpu.utils.checkpoint \
        --checkpoint save_models/exp/60 --out exp60.pt \
        --model-args '{num_class: 2, num_point: 33, num_person: 1,
                       graph: mediapipe_pose}' [--with-meta]
    """
    import argparse

    import yaml

    import jax

    from shift_gcn_tpu.models.registry import get_model
    from shift_gcn_tpu.train.state import create_train_state

    ap = argparse.ArgumentParser(
        description="Export an Orbax checkpoint to a reference torch .pt")
    ap.add_argument("--checkpoint", required=True,
                    help="Orbax checkpoint dir (save_models/<exp>/<epoch>)")
    ap.add_argument("--out", required=True, help=".pt output path")
    ap.add_argument("--model", default="shift_gcn_tpu.models.shift_gcn")
    ap.add_argument("--model-args", default="{}",
                    help="YAML dict of model args (must match training)")
    ap.add_argument("--with-meta", action="store_true",
                    help="write the full resume dict instead of the bare "
                         "--weights state_dict")
    args = ap.parse_args()

    family = get_model(args.model)
    config = family.build_config(yaml.safe_load(args.model_args) or {})
    state = create_train_state(jax.random.key(0), config,
                               init_fn=family.init)
    template = {
        "params": state.params,
        "bn_state": state.bn_state,
        "opt_state": state.opt_state,
        "global_step": state.global_step,
        "meta": {"epoch": 0, "best_acc": 0.0},
    }
    payload = restore_checkpoint(args.checkpoint, template)
    params = jax.tree_util.tree_map(np.asarray, payload["params"])
    bn_state = jax.tree_util.tree_map(np.asarray, payload["bn_state"])
    meta = None
    if args.with_meta:
        meta = {"epoch": int(payload["meta"]["epoch"]),
                "global_step": int(np.asarray(
                    payload["global_step"]).reshape(-1)[0]),
                "best_acc": float(payload["meta"]["best_acc"])}
    export_reference_checkpoint(args.out, params, bn_state, meta)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    _main()
