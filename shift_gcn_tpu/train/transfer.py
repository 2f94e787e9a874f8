"""Host->device batch transfer dtype policy, shared by the Trainer and
the benches (bench.py mirrors the Trainer's behavior by construction).

Shipping batches as bf16 halves the per-step transfer bytes — the
train-side bottleneck on slow interconnects (docs/PERF.md, probe44) —
and the step casts the data back to fp32 on DEVICE, so the only
numerics effect is input quantization (docs/PARITY.md known-deltas).
"""

from __future__ import annotations

import numpy as np


def resolve_transfer_dtype(setting: str, activation_dtype):
    """np dtype for the batch transfer.  setting: 'auto' (bf16 exactly
    when the model runs bf16 activations), 'bfloat16', or 'float32'."""
    if setting == "auto":
        setting = ("bfloat16" if activation_dtype == "bfloat16"
                   else "float32")
    if setting in ("float32", "fp32"):
        return np.float32
    if setting == "bfloat16":
        import ml_dtypes

        return ml_dtypes.bfloat16
    raise ValueError(
        f"transfer_dtype={setting!r}: expected 'auto', 'bfloat16' or "
        "'float32'")


def restore_batch_fp32(batch):
    """Device-side: cast the compact-transferred 'data' back to fp32
    (models and oracles see fp32)."""
    import jax.numpy as jnp

    return dict(batch, data=batch["data"].astype(jnp.float32))
