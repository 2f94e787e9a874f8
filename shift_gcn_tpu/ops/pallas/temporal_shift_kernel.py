"""Pallas TPU kernel for the learnable fractional temporal shift.

The XLA lowering (ops/temporal_shift.py) runs a 2*max_shift+2-tap depthwise
conv over an im2col'd window; this kernel computes the same hat-tap sum in
VMEM in ONE HBM read + one write per element: the per-channel bilinear hat
is materialized as a tiny (K=2*span+2, C) coefficient matrix on the XLA
side (at most two nonzeros per column), the input is zero-padded on the
XLA side, and the kernel is a straight-line chain of K static slice+FMA
ops.  Straight-line slices-of-SSA-values are deliberate: earlier variants
(per-lane binary-decomposition shifts through a VMEM scratch ref, or with
per-step zero concats) made the remote Mosaic compile pathologically slow
(225 s for one kernel) or OOM-killed it on the 20-instance model graph.

Semantics identical to ops/temporal_shift.py::_shift_roll (itself oracle-
tested against the reference CUDA kernel semantics,
model/Temporal_shift/cuda/shift_cuda_kernel.cu:11-76):

    out[n, t, v, c] = (1-frac_c) * x[n, t*stride + lo_c, v, c]
                      + frac_c  * x[n, t*stride + lo_c + 1, v, c]

with zero out-of-range reads, lo = floor(ypos_eff), frac = ypos_eff - lo.
Stride 2 never lowers a strided slice (not Mosaic-supported): the padded
input is split into even/odd temporal phases by a leading-dim reshape and
each tap reads the phase of its parity.

The custom VJP reproduces the reference's constraint backward exactly:
grad_input is the transposed shift (the same kernel applied to the
cotangent with negated positions, plus temporal dilation for stride 2),
xpos grads are zero, ypos moves in fixed ±0.01 steps
(shift_cuda_kernel.cu:370-395).  xpos is treated as exactly zero (see
ASSUME_XPOS_ZERO in ops/temporal_shift.py for why this is sound).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from shift_gcn_tpu.ops.lowering import resolve as _resolve_low

_INTERPRET = False  # tests flip this to run on CPU

# VMEM budget per (in+out) block pair (16 MB VMEM total, leave headroom
# for double buffering)
_VMEM_BLOCK_BUDGET = 8 * 1024 * 1024


def _pick_c_block(t_in: int, v: int, c: int, stride: int) -> int:
    """Channel block honoring the Pallas TPU minor-dim rule.

    The last block dim must be a multiple of 128 or equal to the full C
    (hardware lowering constraint, surfaced as a compile error otherwise),
    so the choice is: full C when C <= 128, else the largest 128-multiple
    that fits the VMEM budget.
    """
    if c <= 128:
        return int(c)
    bytes_per_c = (t_in + t_in // stride) * v * 4
    cb = max(_VMEM_BLOCK_BUDGET // (2 * max(bytes_per_c, 1)), 128)
    cb = (cb // 128) * 128
    return int(min(cb, c))


def _tap_coefficients(pos: jax.Array, span: int, mode: str) -> jax.Array:
    """(K, C) hat coefficients: out[t] = sum_k coef[k] * xpad[t + k].

    xpad is x zero-padded by `span` frames in front, so tap k reads
    x[t + k - span]; the hat places (1-frac) at k = lo+span and frac at
    k = lo+span+1.  mode="diff" instead produces y1 - y0 (the ypos
    direction value used by the constraint backward).
    """
    lo = jnp.floor(pos).astype(jnp.int32)
    frac = (pos - lo.astype(pos.dtype)).astype(jnp.float32)
    k = jnp.arange(2 * span + 2, dtype=jnp.int32)[:, None]   # (K, 1)
    on0 = (k == (lo + span)[None, :]).astype(jnp.float32)
    on1 = (k == (lo + span + 1)[None, :]).astype(jnp.float32)
    if mode == "diff":
        return on1 - on0
    return (1.0 - frac)[None, :] * on0 + frac[None, :] * on1


def _tshift_kernel(x_ref, coef_ref, out_ref, *, stride: int, span: int):
    xp = x_ref[0]                       # (Tp, V, Cb) zero-padded input
    coef = coef_ref[:]                  # (K, Cb)
    tp, v, cb = xp.shape
    k_taps = coef.shape[0]
    t_out = (tp - 2 * span - 2) // stride
    if stride == 1:
        acc = xp[0:t_out] * coef[0][None, None, :]
        for k in range(1, k_taps):
            acc = acc + xp[k:k + t_out] * coef[k][None, None, :]
    else:
        # xpad[s*t + k] = phase[k % s][t + k // s]; leading-dim reshape is
        # layout-free (tiling only constrains the trailing (V, C) dims)
        ph = xp[: (tp // stride) * stride].reshape(
            tp // stride, stride, v, cb)
        acc = ph[0:t_out, 0] * coef[0][None, None, :]
        for k in range(1, k_taps):
            q, r = divmod(k, stride)
            acc = acc + ph[q:q + t_out, r] * coef[k][None, None, :]
    out_ref[0] = acc


def _run_tshift(x: jax.Array, pos: jax.Array, stride: int, span: int,
                mode: str = "hat") -> jax.Array:
    n, t_in, v, c = x.shape
    t_out = t_in // stride
    cb = _pick_c_block(t_in, v, c, stride)
    pad_c = (-c) % cb
    if pad_c:
        x = jnp.concatenate(
            [x, jnp.zeros((n, t_in, v, pad_c), x.dtype)], axis=-1)
        pos = jnp.concatenate([pos, jnp.zeros((pad_c,), pos.dtype)])
    cpad = c + pad_c
    coef = _tap_coefficients(pos, span, mode).astype(x.dtype)
    # zero-pad T on the XLA side (fused into the producer); `span` in
    # front so tap k reads x[t + k - span], span+2 behind so every tap
    # slice is statically in bounds
    xp = jnp.pad(x, ((0, 0), (span, span + 2), (0, 0), (0, 0)))
    tp = t_in + 2 * span + 2
    grid = (n, cpad // cb)
    out = pl.pallas_call(
        functools.partial(_tshift_kernel, stride=stride, span=span),
        interpret=_INTERPRET,
        out_shape=jax.ShapeDtypeStruct((n, t_out, v, cpad), x.dtype),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, tp, v, cb), lambda i, j: (i, 0, 0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2 * span + 2, cb), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, t_out, v, cb),
                                   lambda i, j: (i, 0, 0, j),
                                   memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=64 * 1024 * 1024),
    )(xp, coef)
    return out[..., :c]


def _span(max_shift: Optional[int]) -> int:
    """Static tap radius; None resolves via ops.lowering.resolve() at
    trace time (callers with a per-model Lowering pass low.max_shift)."""
    return max_shift if max_shift is not None else _resolve_low().max_shift


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def temporal_shift_pallas(
    x: jax.Array, xpos: jax.Array, ypos: jax.Array, stride: int = 1,
    max_shift: Optional[int] = None,
) -> jax.Array:
    """Drop-in replacement for ops.temporal_shift.temporal_shift
    (xpos-zero semantics; same stride-2 +0.5 rule, same constraint VJP)."""
    del xpos
    ypos_eff = ypos if stride == 1 else ypos + 0.5
    return _run_tshift(x, ypos_eff, stride, _span(max_shift))


def _fwd(x, xpos, ypos, stride, max_shift):
    ypos_eff = ypos if stride == 1 else ypos + 0.5
    return (_run_tshift(x, ypos_eff, stride, _span(max_shift)),
            (x, xpos, ypos_eff))


def _dilate_time(g: jax.Array, stride: int, t_in: int) -> jax.Array:
    """Insert stride-1 zeros between frames and pad to t_in."""
    n, t_out, v, c = g.shape
    z = jnp.zeros((n, t_out, stride - 1, v, c), g.dtype)
    d = jnp.concatenate([g[:, :, None], z], axis=2).reshape(
        n, t_out * stride, v, c)
    return d[:, :t_in] if d.shape[1] >= t_in else jnp.concatenate(
        [d, jnp.zeros((n, t_in - d.shape[1], v, c), g.dtype)], axis=1)


def _bwd(stride, max_shift, residuals, g):
    span = _span(max_shift)
    x, xpos, ypos_eff = residuals
    # grad_input: the reverse shift — the same kernel with negated
    # positions (exact transpose of the 2-tap lerp; for stride 2 the
    # cotangent is zero-dilated back to input rate first, matching the
    # reference's evenness rule, shift_cuda_kernel.cu:155-256)
    gd = g if stride == 1 else _dilate_time(g, stride, x.shape[1])
    grad_input = _run_tshift(gd, -ypos_eff, 1, span)
    # constraint ypos grad (shift_cuda_kernel.cu:277-395)
    dval_y = _run_tshift(x, ypos_eff, stride, span, mode="diff")
    gy_raw = jnp.sum(jnp.mean(
        (dval_y * g).astype(jnp.float32), axis=0), axis=(0, 1))
    from shift_gcn_tpu.ops.temporal_shift import constraint_step

    gy = constraint_step(gy_raw)
    return grad_input, jnp.zeros_like(xpos), gy.astype(ypos_eff.dtype)


temporal_shift_pallas.defvjp(_fwd, _bwd)
