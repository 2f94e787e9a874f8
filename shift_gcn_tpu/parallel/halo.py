"""Sequence parallelism: temporal-axis sharding with halo exchange.

The reference keeps whole 300-frame clips per device (feeder.py:74-90); the
only cross-frame dependencies in the model are the fractional temporal shift
(reach <= MAX_SHIFT + 1 frames) and the k x 1 residual conv (k=1 in
practice).  Sharding T over a mesh axis therefore needs only a halo exchange
of a few frames between neighboring shards per block — `ppermute` traffic
that rides ICI and overlaps with local compute under XLA's scheduler.

Used inside `jax.shard_map` with the time axis sharded on `axis_name`.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from shift_gcn_tpu.ops.temporal_shift import (
    MAX_SHIFT as _MAX_SHIFT,
    _hat_taps,
)


def halo_exchange(x: jax.Array, halo_lo: int, halo_hi: int,
                  axis_name: str) -> jax.Array:
    """Extend the local T block with neighbor frames (zeros at chain ends).

    x: (N, T_local, V, C) inside shard_map. Returns
    (N, halo_lo + T_local + halo_hi, V, C).
    """
    size = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)

    pieces = []
    if halo_lo > 0:
        # receive the last halo_lo frames of the left neighbor
        src_tail = x[:, -halo_lo:]
        left = jax.lax.ppermute(
            src_tail, axis_name,
            [(i, (i + 1) % size) for i in range(size)])
        left = jnp.where(idx == 0, jnp.zeros_like(left), left)
        pieces.append(left)
    pieces.append(x)
    if halo_hi > 0:
        src_head = x[:, :halo_hi]
        right = jax.lax.ppermute(
            src_head, axis_name,
            [(i, (i - 1) % size) for i in range(size)])
        right = jnp.where(idx == size - 1, jnp.zeros_like(right), right)
        pieces.append(right)
    return jnp.concatenate(pieces, axis=1)


def sharded_temporal_shift(
    x: jax.Array,
    xpos: jax.Array,
    ypos: jax.Array,
    stride: int,
    axis_name: str,
) -> jax.Array:
    """Temporal shift over a T-sharded activation (inside shard_map).

    Exchanges MAX_SHIFT(+1) halo frames, runs the dense tap contraction on
    the extended block, and keeps the local T_local//stride output rows.
    Matches the unsharded `temporal_shift` exactly (global zero padding
    falls out of the zero halos at the chain ends).

    Requires T_local divisible by stride.  Forward-only (the sharded
    training path composes this under grad via the surrounding shard_map).
    """
    ypos_eff = ypos if stride == 1 else ypos + 0.5
    k = _MAX_SHIFT
    halo_lo, halo_hi = k, k + 1
    ext = halo_exchange(x, halo_lo, halo_hi, axis_name)

    n, t_ext, v, c = ext.shape
    t_local = x.shape[1]
    t_out = t_local // stride
    taps_t = _hat_taps(ypos_eff, -k, k + 1)
    taps_v = _hat_taps(xpos, -1, 1)

    # local output row t reads ext[t*stride + halo_lo + tap] with taps
    # anchored at -k; slide the slice window accordingly.
    xv = jnp.pad(ext, ((0, 0), (0, 0), (1, 1), (0, 0)))
    h = sum(
        jax.lax.slice_in_dim(xv, j, j + v, axis=2) * taps_v[j]
        for j in range(taps_v.shape[0]))
    out = None
    qt = taps_t.shape[0]
    for q in range(qt):
        start = q  # == halo_lo + (q - k) with halo_lo == k
        sl = jax.lax.slice(
            h, (0, start, 0, 0),
            (n, start + (t_out - 1) * stride + 1, v, c),
            (1, stride, 1, 1))
        term = sl * taps_t[q]
        out = term if out is None else out + term
    return out
