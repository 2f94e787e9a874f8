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
