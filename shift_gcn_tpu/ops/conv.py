"""Convolution helpers in channels-last layout with torch-shaped weights.

Weights are stored exactly as torch state_dict entries — conv weight
(C_out, C_in, kT, kV), bias (C_out,) — so converted reference checkpoints
load without reshaping; the ops transpose internally for the TPU-friendly
NHWC compute layout.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def pointwise_conv(
    x: jax.Array,
    weight: jax.Array,
    bias: Optional[jax.Array] = None,
    *,
    compute_dtype: Optional[jnp.dtype] = None,
) -> jax.Array:
    """1x1 conv as a matmul. x: (..., C_in); weight: (C_out, C_in, 1, 1) or
    (C_out, C_in)."""
    w = weight.reshape(weight.shape[0], weight.shape[1])  # (C_out, C_in)
    h = x
    if compute_dtype is not None:
        h = h.astype(compute_dtype)
        w = w.astype(compute_dtype)
    # accumulate in fp32, return in the input activation dtype (f32
    # pipelines unchanged; bf16-activation pipelines stay bf16)
    out = jnp.einsum("...c,dc->...d", h, w.astype(h.dtype),
                     preferred_element_type=jnp.float32)
    out = out.astype(x.dtype)
    if bias is not None:
        out = out + bias.astype(x.dtype)
    return out


def temporal_conv(
    x: jax.Array,
    weight: jax.Array,
    bias: Optional[jax.Array] = None,
    *,
    stride: int = 1,
    compute_dtype: Optional[jnp.dtype] = None,
) -> jax.Array:
    """k x 1 temporal conv with SAME-style padding pad=(k-1)//2.

    Matches the reference residual `tcn` (model/shift_gcn.py:31-45):
    Conv2d(kernel=(k,1), padding=((k-1)//2, 0), stride=(s,1)) on (N,C,T,V).

    Args:
      x: (N, T, V, C_in).
      weight: (C_out, C_in, k, 1) torch OIHW.
    Returns:
      (N, T_out, V, C_out) with T_out = floor((T + 2*pad - k)/s) + 1.
    """
    k = weight.shape[2]
    pad = (k - 1) // 2
    # compute_dtype is ignored (this k x 1 residual conv is a negligible
    # share of the FLOPs), but the conv must run UNIFORMLY in the input's
    # activation dtype: XLA's conv transpose rule rejects mixed
    # bf16-operand/f32-cotangent convs, so kernel and accumulator follow
    # x.dtype and the caller casts as needed.
    del compute_dtype
    h = x
    w = weight.astype(x.dtype)
    out = jax.lax.conv_general_dilated(
        h,
        w,
        window_strides=(stride, 1),
        padding=((pad, pad), (0, 0)),
        dimension_numbers=("NHWC", "OIHW", "NHWC"),
        preferred_element_type=x.dtype,
    )
    if bias is not None:
        out = out + bias.astype(x.dtype)
    return out
