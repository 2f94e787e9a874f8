"""Learnable fractional temporal shift (TPU-native replacement for the
reference CUDA extension).

Semantics re-derived from reference model/Temporal_shift/cuda/:

Forward (shift_cuda_kernel.cu:11-76): per channel c, with shift positions
(xpos[c], ypos[c]) and temporal stride s,

    out[n, t, v, c] = sum over 4 bilinear corners of
        x[n, t*s + floor(y) + {0,1}, v + floor(x) + {0,1}, c]
        weighted by (1-dy|dy)(1-dx|dx),  out-of-range corners read 0.

When stride != 1 the wrapper adds +0.5 to ypos first (shift.py:17-19).

Backward — deliberately NOT the true gradient:
- grad_input reverses the shift with (-x, -y) bilinear weights
  (shift_cuda_kernel.cu:78-152); for stride 2 only even target rows map back
  (shift_cuda_kernel.cu:155-256).
- position grads are first computed from bilinear corner differences x
  grad_output, reduced mean-over-batch then sum-over-(T,V)
  (shift_cuda_kernel.cu:277-363, 501-509), then OVERWRITTEN by a constraint
  (shift_cuda_kernel.cu:370-395):

      if |gy| != 0:  gx := 0,  gy := 0.01 * sign(gy)
      else:          gx := 0,  gy := 0.0001

  so xpos never trains and ypos moves in fixed-magnitude steps.  This is
  load-bearing for training parity and is reproduced exactly via
  `jax.custom_vjp`.

Layout: channels-last (N, T, V, C); the reference uses (N, C, T=H, V=W).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def _corner_weights(pos: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """floor index, fractional part, per-channel. pos: (C,) float."""
    p1 = jnp.floor(pos)
    return p1.astype(jnp.int32), pos - p1, p1


def _gather_tv(x: jax.Array, tidx: jax.Array, vidx: jax.Array) -> jax.Array:
    """Gather x[n, tidx[t,c], vidx[v,c], c] with zero padding out of range.

    x: (N, T, V, C); tidx: (T_out, C) int32; vidx: (V, C) int32.
    Returns (N, T_out, V, C).
    """
    n, t_in, v_in, c = x.shape
    t_ok = (tidx >= 0) & (tidx < t_in)          # (T_out, C)
    v_ok = (vidx >= 0) & (vidx < v_in)          # (V, C)
    tc = jnp.clip(tidx, 0, t_in - 1)
    vc = jnp.clip(vidx, 0, v_in - 1)
    g = jnp.take_along_axis(x, tc[None, :, None, :], axis=1)
    g = jnp.take_along_axis(g, vc[None, None, :, :], axis=2)
    mask = t_ok[None, :, None, :] & v_ok[None, None, :, :]
    return jnp.where(mask, g, 0.0)


def _bilinear_apply(
    x: jax.Array, xpos: jax.Array, ypos: jax.Array, stride: int
) -> jax.Array:
    """Forward bilinear shift: x (N,T,V,C) -> (N, T//stride, V, C)."""
    n, t_in, v_in, c = x.shape
    t_out = t_in // stride
    x1, dx, _ = _corner_weights(xpos)
    y1, dy, _ = _corner_weights(ypos)

    t_base = jnp.arange(t_out, dtype=jnp.int32)[:, None] * stride  # (T_out,1)
    v_base = jnp.arange(v_in, dtype=jnp.int32)[:, None]            # (V,1)
    t1 = t_base + y1[None, :]
    t2 = t1 + 1
    v1 = v_base + x1[None, :]
    v2 = v1 + 1

    q11 = _gather_tv(x, t1, v1)
    q21 = _gather_tv(x, t1, v2)
    q12 = _gather_tv(x, t2, v1)
    q22 = _gather_tv(x, t2, v2)

    dx = dx[None, None, None, :]
    dy = dy[None, None, None, :]
    return (q11 * (1 - dx) * (1 - dy) + q21 * dx * (1 - dy)
            + q12 * (1 - dx) * dy + q22 * dx * dy)


def _grad_input_stride1(
    g: jax.Array, xpos: jax.Array, ypos: jax.Array
) -> jax.Array:
    """Reverse shift of grad_output with (-x, -y) (shift_cuda_kernel.cu:78-152)."""
    return _bilinear_apply(g, -xpos, -ypos, stride=1)


def _grad_input_strided(
    g: jax.Array, xpos: jax.Array, ypos: jax.Array, stride: int, t_in: int
) -> jax.Array:
    """Strided reverse shift (shift_cuda_kernel.cu:155-256).

    For each input row h, corner rows h+floor(-y)+{0,1} contribute only when
    divisible by the stride, reading grad_output at the divided row.
    g: (N, T_out, V, C) -> (N, t_in, V, C).
    """
    n, t_out, v_in, c = g.shape
    x1, dx, _ = _corner_weights(-xpos)
    y1, dy, _ = _corner_weights(-ypos)

    t_base = jnp.arange(t_in, dtype=jnp.int32)[:, None]   # (T_in, 1)
    v_base = jnp.arange(v_in, dtype=jnp.int32)[:, None]   # (V, 1)
    v_lo = v_base + x1[None, :]
    v_hi = v_lo + 1

    def corner(t_im: jax.Array, vidx: jax.Array) -> jax.Array:
        # t_im: (T_in, C) candidate rows in grad_output*stride space.
        even = (t_im % stride) == 0
        t_div = t_im // stride
        valid = even & (t_div >= 0) & (t_div < t_out)
        t_safe = jnp.clip(t_div, 0, t_out - 1)
        got = _gather_tv(g, t_safe, vidx)
        return jnp.where(valid[None, :, None, :], got, 0.0)

    t_lo = t_base + y1[None, :]
    t_hi = t_lo + 1
    q11 = corner(t_lo, v_lo)
    q21 = corner(t_lo, v_hi)
    q12 = corner(t_hi, v_lo)
    q22 = corner(t_hi, v_hi)

    dx = dx[None, None, None, :]
    dy = dy[None, None, None, :]
    return (q11 * (1 - dx) * (1 - dy) + q21 * dx * (1 - dy)
            + q12 * (1 - dx) * dy + q22 * dx * dy)


def _position_grads(
    x: jax.Array, g: jax.Array, xpos: jax.Array, ypos: jax.Array, stride: int
) -> Tuple[jax.Array, jax.Array]:
    """Raw per-channel position grads before the constraint.

    val_x = (1-dy)(q21-q11) + dy(q22-q12); val_y = (1-dx)(q12-q11)+dx(q22-q21)
    reduced mean over batch then sum over (T_out, V)
    (shift_cuda_kernel.cu:343-349, 501-509).
    """
    n, t_in, v_in, c = x.shape
    t_out = t_in // stride
    x1, dx, _ = _corner_weights(xpos)
    y1, dy, _ = _corner_weights(ypos)
    t_base = jnp.arange(t_out, dtype=jnp.int32)[:, None] * stride
    v_base = jnp.arange(v_in, dtype=jnp.int32)[:, None]
    t1 = t_base + y1[None, :]
    t2 = t1 + 1
    v1 = v_base + x1[None, :]
    v2 = v1 + 1
    q11 = _gather_tv(x, t1, v1)
    q21 = _gather_tv(x, t1, v2)
    q12 = _gather_tv(x, t2, v1)
    q22 = _gather_tv(x, t2, v2)
    dxb = dx[None, None, None, :]
    dyb = dy[None, None, None, :]
    val_x = (1 - dyb) * (q21 - q11) + dyb * (q22 - q12)
    val_y = (1 - dxb) * (q12 - q11) + dxb * (q22 - q21)
    # mean over batch, then sum over T_out and V
    gx = jnp.sum(jnp.mean(val_x * g, axis=0), axis=(0, 1))
    gy = jnp.sum(jnp.mean(val_y * g, axis=0), axis=(0, 1))
    return gx, gy


def _apply_constraint(
    gx: jax.Array, gy: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Overwrite position grads with fixed-magnitude steps
    (shift_cuda_kernel.cu:370-395)."""
    dr = jnp.abs(gy)
    gx_out = jnp.zeros_like(gx)
    gy_out = jnp.where(dr != 0, gy / jnp.where(dr != 0, dr, 1.0) * 0.01, 1e-4)
    return gx_out, gy_out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def temporal_shift(
    x: jax.Array, xpos: jax.Array, ypos: jax.Array, stride: int = 1
) -> jax.Array:
    """Learnable fractional temporal shift.

    Args:
      x: (N, T, V, C) input.
      xpos: (C,) per-channel joint-axis shift (effectively ~0 in practice).
      ypos: (C,) per-channel temporal shift.
      stride: temporal stride (output T = T // stride). For stride != 1 the
        effective ypos is ypos + 0.5 (reference shift.py:17-19).

    Returns:
      (N, T // stride, V, C).
    """
    ypos_eff = ypos if stride == 1 else ypos + 0.5
    return _bilinear_apply(x, xpos, ypos_eff, stride)


def _temporal_shift_fwd(x, xpos, ypos, stride):
    ypos_eff = ypos if stride == 1 else ypos + 0.5
    out = _bilinear_apply(x, xpos, ypos_eff, stride)
    return out, (x, xpos, ypos_eff)


def _temporal_shift_bwd(stride, residuals, g):
    x, xpos, ypos_eff = residuals
    if stride == 1:
        grad_input = _grad_input_stride1(g, xpos, ypos_eff)
    else:
        grad_input = _grad_input_strided(g, xpos, ypos_eff, stride, x.shape[1])
    gx_raw, gy_raw = _position_grads(x, g, xpos, ypos_eff, stride)
    gx, gy = _apply_constraint(gx_raw, gy_raw)
    return grad_input, gx, gy


temporal_shift.defvjp(_temporal_shift_fwd, _temporal_shift_bwd)


def temporal_shift_inference(
    x: jax.Array, xpos: jax.Array, ypos: jax.Array, stride: int = 1
) -> jax.Array:
    """Forward-only path without the custom VJP plumbing (identical output)."""
    ypos_eff = ypos if stride == 1 else ypos + 0.5
    return _bilinear_apply(x, xpos, ypos_eff, stride)
