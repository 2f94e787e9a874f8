"""Pallas TPU kernel for the learnable fractional temporal shift.

The XLA lowering (ops/temporal_shift.py) runs a 2*MAX_SHIFT+2-tap depthwise
conv although only TWO taps are nonzero per channel (bilinear hats).  This
kernel does the exact 2-tap computation in VMEM: the integer part of each
channel's shift becomes a per-lane shift via binary decomposition
(ceil(log2(2*MAX_SHIFT)) conditional zero-fill shifts, each a cheap VPU
select), the fractional part a 2-slice lerp — one HBM read + one write per
element.

Semantics identical to ops/temporal_shift.py::_shift_roll (itself oracle-
tested against the reference CUDA kernel semantics,
model/Temporal_shift/cuda/shift_cuda_kernel.cu:11-76):

    out[n, t, v, c] = (1-frac_c) * x[n, t*stride + lo_c, v, c]
                      + frac_c  * x[n, t*stride + lo_c + 1, v, c]

with zero out-of-range reads, lo = floor(ypos_eff), frac = ypos_eff - lo.
The custom VJP reproduces the reference's constraint backward exactly:
grad_input is the transposed shift (the same kernel applied to the
cotangent with negated positions, plus temporal dilation for stride 2),
xpos grads are zero, ypos moves in fixed ±0.01 steps
(shift_cuda_kernel.cu:370-395).  xpos is treated as exactly zero (see
ASSUME_XPOS_ZERO in ops/temporal_shift.py for why this is sound).

Status: bit-exact in interpret mode and standalone on TPU; composition
into full model graphs is blocked by the platform's remote-compile bug
(CLAUDE.md) — kept as the measured-speed-of-light candidate for when that
clears.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from shift_gcn_tpu.ops.temporal_shift import MAX_SHIFT

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


def _tshift_kernel(x_ref, pos_ref, out_ref, y_ref, *, stride: int,
                   span: int, mode: str):
    x = x_ref[0]                       # (T_in, V, Cb)
    t_in, v, cb = x.shape
    t_out = t_in // stride
    pos = pos_ref[0]                   # (Cb,)
    lo = jnp.floor(pos).astype(jnp.int32)
    frac = (pos - lo.astype(pos.dtype))[None, None, :]
    amt = lo + span                    # in [0, 2*span]

    # y[i] = x[i + lo] with zero fill: first shift left by `amt` via binary
    # decomposition (lane-wise selects), anchored at -span.  The loop
    # round-trips through a VMEM scratch ref: with SSA values the Mosaic
    # stack allocator keeps every iteration's copy live (measured 52 MB of
    # scoped VMEM on a (300,33,64) block — probe18); the ref store caps
    # liveness at ~3 copies.  The scratch carries a 2*span zero tail that
    # no iteration ever writes, so each step's shifted read is a STATIC
    # in-bounds slice — no per-step concat with a zeros block (the concat
    # form OOM-killed the Mosaic compile on the 20-instance model graph).
    pad_lo = span
    l0 = pad_lo + t_in + span + 2      # live region; [l0, l0+2*span) stays 0
    y_ref[:pad_lo] = jnp.zeros((pad_lo, v, cb), x.dtype)
    y_ref[pad_lo:pad_lo + t_in] = x
    y_ref[pad_lo + t_in:] = jnp.zeros(
        (y_ref.shape[0] - pad_lo - t_in, v, cb), x.dtype)
    step = 1
    while step <= 2 * span:
        bit = ((amt // step) % 2 == 1)[None, None, :]
        y_ref[:l0] = jnp.where(bit, y_ref[step:step + l0], y_ref[:l0])
        step *= 2
    y = y_ref[:l0]
    # after the shift, y[i] == concat[i + amt] == x[i + lo] (zeros OOB):
    # the pad_lo offset and the +span in amt cancel, so the output window
    # starts at i = 0 (same anchoring as ops/temporal_shift._shift_roll).
    # Strided slices are not Mosaic-lowerable (strides confined to [1,2));
    # downsample via a leading-dim reshape instead, which is layout-free
    # (tiling only constrains the trailing (V, C) dims).
    if stride == 1:
        y0 = y[:t_out]
        y1 = y[1:t_out + 1]
    else:
        y0 = y[:t_out * stride].reshape(t_out, stride, v, cb)[:, 0]
        y1 = y[1:t_out * stride + 1].reshape(t_out, stride, v, cb)[:, 0]
    if mode == "diff":
        out_ref[0] = y1 - y0
    else:
        out_ref[0] = y0 * (1.0 - frac) + y1 * frac


def _run_tshift(x: jax.Array, pos: jax.Array, stride: int,
                mode: str = "hat") -> jax.Array:
    n, t_in, v, c = x.shape
    t_out = t_in // stride
    span = MAX_SHIFT
    cb = _pick_c_block(t_in, v, c, stride)
    pad_c = (-c) % cb
    if pad_c:
        x = jnp.concatenate(
            [x, jnp.zeros((n, t_in, v, pad_c), x.dtype)], axis=-1)
        pos = jnp.concatenate([pos, jnp.zeros((pad_c,), pos.dtype)])
    cpad = c + pad_c
    grid = (n, cpad // cb)
    out = pl.pallas_call(
        functools.partial(_tshift_kernel, stride=stride, span=span,
                          mode=mode),
        interpret=_INTERPRET,
        out_shape=jax.ShapeDtypeStruct((n, t_out, v, cpad), x.dtype),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, t_in, v, cb), lambda i, j: (i, 0, 0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, cb), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, t_out, v, cb),
                                   lambda i, j: (i, 0, 0, j),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((t_in + 4 * span + 2, v, cb), x.dtype)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=64 * 1024 * 1024),
    )(x, pos[None])
    return out[..., :c]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def temporal_shift_pallas(
    x: jax.Array, xpos: jax.Array, ypos: jax.Array, stride: int = 1
) -> jax.Array:
    """Drop-in replacement for ops.temporal_shift.temporal_shift
    (xpos-zero semantics; same stride-2 +0.5 rule, same constraint VJP)."""
    del xpos
    ypos_eff = ypos if stride == 1 else ypos + 0.5
    return _run_tshift(x, ypos_eff, stride)


def _fwd(x, xpos, ypos, stride):
    ypos_eff = ypos if stride == 1 else ypos + 0.5
    return _run_tshift(x, ypos_eff, stride), (x, xpos, ypos_eff)


def _dilate_time(g: jax.Array, stride: int, t_in: int) -> jax.Array:
    """Insert stride-1 zeros between frames and pad to t_in."""
    n, t_out, v, c = g.shape
    z = jnp.zeros((n, t_out, stride - 1, v, c), g.dtype)
    d = jnp.concatenate([g[:, :, None], z], axis=2).reshape(
        n, t_out * stride, v, c)
    return d[:, :t_in] if d.shape[1] >= t_in else jnp.concatenate(
        [d, jnp.zeros((n, t_in - d.shape[1], v, c), g.dtype)], axis=1)


def _bwd(stride, residuals, g):
    x, xpos, ypos_eff = residuals
    # grad_input: the reverse shift — the same kernel with negated
    # positions (exact transpose of the 2-tap lerp; for stride 2 the
    # cotangent is zero-dilated back to input rate first, matching the
    # reference's evenness rule, shift_cuda_kernel.cu:155-256)
    gd = g if stride == 1 else _dilate_time(g, stride, x.shape[1])
    grad_input = _run_tshift(gd, -ypos_eff, 1)
    # constraint ypos grad (shift_cuda_kernel.cu:277-395)
    dval_y = _run_tshift(x, ypos_eff, stride, mode="diff")
    gy_raw = jnp.sum(jnp.mean(
        (dval_y * g).astype(jnp.float32), axis=0), axis=(0, 1))
    dr = jnp.abs(gy_raw)
    gy = jnp.where(dr != 0,
                   gy_raw / jnp.where(dr != 0, dr, 1.0) * 0.01,
                   1e-4)
    return grad_input, jnp.zeros_like(xpos), gy.astype(ypos_eff.dtype)


temporal_shift_pallas.defvjp(_fwd, _bwd)
