"""Spatial channel shift for Shift-GCN.

The reference implements the "spatial shift graph convolution" as two integer
circular shifts over the flattened (V*C) axis via precomputed `index_select`
indices (reference: model/shift_gcn.py:108-118, 127, 136):

    flat index rule:  out[i*C + j] = x[(i*C + j ± j*C) mod (C*V)]

which algebraically reduces to a per-channel circular roll along the joint
axis (writing v=i, c=j):

    shift_in :  out[v, c] = x[(v + c) mod V, c]
    shift_out:  out[v, c] = x[(v - c) mod V, c]

We implement it directly in the channels-last (..., V, C) layout as a gather
with a precomputed (V, C) index matrix — a layout that keeps the subsequent
pointwise matmul MXU-friendly.  A one-hot matmul variant is provided for
benchmarking (on TPU, small-V gathers sometimes lower better as matmuls).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def shift_indices(num_nodes: int, channels: int, direction: int) -> np.ndarray:
    """(V, C) int32 index matrix: out[v, c] = x[idx[v, c], c].

    direction=+1 reproduces the reference `shift_in` rule, -1 `shift_out`
    (reference: model/shift_gcn.py:108-118).
    """
    v = np.arange(num_nodes)[:, None]
    c = np.arange(channels)[None, :]
    return ((v + direction * c) % num_nodes).astype(np.int32)


@functools.lru_cache(maxsize=None)
def _shift_onehot(num_nodes: int, channels: int, direction: int) -> np.ndarray:
    """(C, V, V) one-hot permutation P with out[:, v, c] = sum_u P[c, v, u] x[:, u, c]."""
    idx = shift_indices(num_nodes, channels, direction)  # (V, C)
    p = np.zeros((channels, num_nodes, num_nodes), dtype=np.float32)
    c = np.arange(channels)
    for v in range(num_nodes):
        p[c, v, idx[v, :]] = 1.0
    return p


def spatial_shift(x: jax.Array, direction: int) -> jax.Array:
    """Per-channel circular roll along the joint axis.

    Args:
      x: (..., V, C) array.
      direction: +1 for shift_in, -1 for shift_out.

    Returns:
      Shifted array, same shape.
    """
    v, c = x.shape[-2], x.shape[-1]
    idx = jnp.asarray(shift_indices(v, c, direction))
    idx = idx.reshape((1,) * (x.ndim - 2) + (v, c))
    return jnp.take_along_axis(x, idx, axis=-2)


def spatial_shift_onehot(x: jax.Array, direction: int) -> jax.Array:
    """Same as `spatial_shift` via per-channel permutation matmul (MXU path)."""
    v, c = x.shape[-2], x.shape[-1]
    p = jnp.asarray(_shift_onehot(v, c, direction))
    # exact permutation: forbid the TPU's default bf16 matmul passes
    return jnp.einsum("cvu,...uc->...vc", p, x,
                      precision=jax.lax.Precision.HIGHEST)


def shift_gcn_transform(
    x: jax.Array,
    weight: jax.Array,
    bias: jax.Array,
    feature_mask: jax.Array,
    *,
    compute_dtype: jnp.dtype | None = None,
) -> jax.Array:
    """The core spatial Shift-GCN transform (shift → mask → matmul → shift).

    Matches reference model/shift_gcn.py:121-136 (up to layout): shift_in,
    multiply by gate (tanh(mask)+1), pointwise matmul + bias, shift_out.
    BatchNorm / residual / relu live in the model layer.

    Args:
      x: (..., V, C_in).
      weight: (C_in, C_out) — torch `Linear_weight` shape.
      bias: (C_out,) or broadcastable — torch `Linear_bias` is (1, 1, C_out).
      feature_mask: (V, C_in) or broadcastable — torch `Feature_Mask` is
        (1, V, C_in).

    Returns:
      (..., V, C_out).
    """
    h = spatial_shift(x, +1)
    gate = jnp.tanh(feature_mask.reshape(x.shape[-2], x.shape[-1])) + 1.0
    h = h * gate
    if compute_dtype is not None:
        h = h.astype(compute_dtype)
        weight = weight.astype(compute_dtype)
    out = jnp.einsum(
        "...vc,cd->...vd", h, weight, preferred_element_type=jnp.float32)
    out = out + bias.reshape((1,) * (out.ndim - 1) + (out.shape[-1],))
    return spatial_shift(out, -1)
