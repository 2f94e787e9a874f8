"""Sequence parallelism: temporal-axis sharding with halo exchange.

The reference keeps whole 300-frame clips per device (feeder.py:74-90); the
only cross-frame dependencies in the model are the fractional temporal shift
(reach <= max_shift + 1 frames) and the k x 1 residual conv (k=1 in
practice).  Sharding T over a mesh axis therefore needs only a halo exchange
of a few frames between neighboring shards per block — `ppermute` traffic
that rides ICI and overlaps with local compute under XLA's scheduler.

Two entry points, both used inside `jax.shard_map` with the time axis
sharded on `axis_name`:

- `sharded_temporal_shift`: forward lowering (eval / inference).
- `sharded_temporal_shift_train`: same forward plus the reference's
  constraint backward (shift_cuda_kernel.cu:370-395) as a `custom_vjp`:
  grad_input is the true transposed halo conv (reverse `ppermute`s carry
  boundary cotangents back), xpos grad is zero, and the ypos grad is the
  fixed-magnitude +-0.01 step whose sign comes from the corner-difference
  inner product reduced over the *global* (batch, time) extent — psum over
  the time axis, pmean over the batch axis — exactly matching the
  unsharded `temporal_shift` VJP.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from shift_gcn_tpu.ops.lowering import resolve as _resolve_low
from shift_gcn_tpu.ops.temporal_shift import (
    _floor_taps,
    _hat_taps,
)


def _radius(max_shift: Optional[int]) -> int:
    """Static tap radius for this call.  None resolves through
    ops.lowering.resolve() (env > defaults) at trace time — callers that
    carry a per-model Lowering (models/shift_gcn.py) pass
    ``low.max_shift`` explicitly so the radius is config-pinned, never
    ambient process state."""
    return max_shift if max_shift is not None else _resolve_low().max_shift


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


def _sharded_shift_conv(
    x: jax.Array,
    taps_t: jax.Array,
    taps_v: Optional[jax.Array],
    stride: int,
    axis_name: str,
    k: int,
) -> jax.Array:
    """Halo-extended dense tap contraction over a T-sharded block.

    x: (N, T_local, V, C); taps_t: (2*k+2, C) anchored at -k, with k the
    static tap radius.  Returns (N, T_local // stride, V, C).
    """
    halo_lo, halo_hi = k, k + 1
    if x.shape[1] < max(halo_lo, halo_hi):
        raise ValueError(
            f"T_local={x.shape[1]} must be >= max_shift+1={k + 1} for a "
            "single-hop halo exchange; use more frames per shard or lower "
            "lowering.max_shift")
    ext = halo_exchange(x, halo_lo, halo_hi, axis_name)

    n, t_ext, v, c = ext.shape
    t_local = x.shape[1]
    t_out = t_local // stride

    if taps_v is not None:
        xv = jnp.pad(ext, ((0, 0), (0, 0), (1, 1), (0, 0)))
        h = sum(
            jax.lax.slice_in_dim(xv, j, j + v, axis=2) * taps_v[j]
            for j in range(taps_v.shape[0]))
    else:
        h = ext
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


def sharded_temporal_shift(
    x: jax.Array,
    xpos: jax.Array,
    ypos: jax.Array,
    stride: int,
    axis_name: str,
    max_shift: Optional[int] = None,
) -> jax.Array:
    """Temporal shift over a T-sharded activation (inside shard_map).

    Exchanges max_shift(+1) halo frames, runs the dense tap contraction on
    the extended block, and keeps the local T_local//stride output rows.
    Matches the unsharded `temporal_shift` exactly (global zero padding
    falls out of the zero halos at the chain ends).

    ``max_shift``: static tap radius; None resolves via
    ops.lowering.resolve() (see `_radius`).

    Requires T_local divisible by stride and >= max_shift + 1.  Forward
    lowering only — for training use `sharded_temporal_shift_train`, which
    adds the reference constraint backward.
    """
    k = _radius(max_shift)
    ypos_eff = ypos if stride == 1 else ypos + 0.5
    taps_t = _hat_taps(ypos_eff, -k, k + 1)
    taps_v = _hat_taps(xpos, -1, 1)
    return _sharded_shift_conv(x, taps_t, taps_v, stride, axis_name, k)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def sharded_temporal_shift_train(
    x: jax.Array,
    xpos: jax.Array,
    ypos: jax.Array,
    stride: int,
    axis_name: str,
    batch_axes: Tuple[str, ...] = (),
    max_shift: Optional[int] = None,
) -> jax.Array:
    """`sharded_temporal_shift` with the reference constraint backward.

    Used inside a shard_map whose mesh axes are exactly
    ``batch_axes + (axis_name,)`` with the position parameters replicated
    (in_spec P()).  The backward reduces the corner-difference inner
    product over the GLOBAL (batch, time) extent (psum over the time
    axis, pmean over the batch axes) before applying the constraint, so
    the ypos cotangent is the exact +-0.01 / 1e-4 value, identical on
    every device.  JAX's VMA-aware shard_map AD passes such
    device-invariant cotangents of replicated inputs through UNSCALED (no
    extra psum — verified by the equality tests in tests/test_parallel.py
    against the unsharded `temporal_shift` VJP; reference semantics:
    shift_cuda_kernel.cu:370-395).  Do not pre-divide by the device
    count.
    """
    k = _radius(max_shift)
    ypos_eff = ypos if stride == 1 else ypos + 0.5
    taps_t = _hat_taps(ypos_eff, -k, k + 1)
    taps_v = _hat_taps(xpos, -1, 1)
    return _sharded_shift_conv(x, taps_t, taps_v, stride, axis_name, k)


def _sts_fwd(x, xpos, ypos, stride, axis_name, batch_axes, max_shift):
    ypos_eff = ypos if stride == 1 else ypos + 0.5
    out = sharded_temporal_shift_train(
        x, xpos, ypos, stride, axis_name, batch_axes, max_shift)
    return out, (x, xpos, ypos_eff)


def _sts_bwd(stride, axis_name, batch_axes, max_shift, residuals, g):
    k = _radius(max_shift)
    x, xpos, ypos_eff = residuals
    taps_t = _hat_taps(ypos_eff, -k, k + 1)
    taps_v = _hat_taps(xpos, -1, 1)

    # grad_input: true VJP of the (linear-in-x) halo conv — the transposed
    # ppermutes carry boundary cotangents back to their source shards.
    _, vjp_fn = jax.vjp(
        lambda xx: _sharded_shift_conv(xx, taps_t, taps_v, stride,
                                       axis_name, k), x)
    grad_input, = vjp_fn(g)

    # raw ypos grad: corner-difference conv, then mean over the global
    # batch (pmean over batch_axes of local-batch means) and sum over the
    # global (T, V) extent (psum over the time axis of local sums) —
    # identical reduction to the unsharded VJP (cu:343-349, 501-509).
    dtaps_t = _floor_taps(ypos_eff, -k, k + 1)
    dval_y = _sharded_shift_conv(x, dtaps_t, taps_v, stride, axis_name, k)
    gy_local = jnp.sum(jnp.mean(
        (dval_y * g).astype(jnp.float32), axis=0), axis=(0, 1))
    gy_raw = jax.lax.psum(gy_local, axis_name)
    if batch_axes:
        gy_raw = jax.lax.pmean(gy_raw, batch_axes)

    # constraint (cu:370-395): fixed-magnitude steps, xpos frozen.  The
    # returned cotangent is already device-invariant (globally reduced
    # above), and JAX's VMA-aware shard_map AD passes invariant cotangents
    # of replicated inputs through unscaled — so this IS the final grad.
    from shift_gcn_tpu.ops.temporal_shift import constraint_step

    gy = constraint_step(gy_raw).astype(ypos_eff.dtype)
    gx = jnp.zeros_like(xpos)
    return grad_input, gx, gy


sharded_temporal_shift_train.defvjp(_sts_fwd, _sts_bwd)
