"""Learnable fractional temporal shift (TPU-native replacement for the
reference CUDA extension).

Semantics re-derived from reference model/Temporal_shift/cuda/:

Forward (shift_cuda_kernel.cu:11-76): per channel c, with shift positions
(xpos[c], ypos[c]) and temporal stride s,

    out[n, t, v, c] = sum over 4 bilinear corners of
        x[n, t*s + floor(y) + {0,1}, v + floor(x) + {0,1}, c]
        weighted by (1-dy|dy)(1-dx|dx),  out-of-range corners read 0.

When stride != 1 the wrapper adds +0.5 to ypos first (shift.py:17-19).

TPU-native formulation: bilinear interpolation with per-channel scalar
offsets is exactly a **depthwise 2D convolution** whose taps are hat
functions of the offsets:

    out[t, v, c] = sum_{k, j} hat(y_c - k) * hat(x_c - j) * x[t*s + k, v + j, c]

with hat(d) = max(0, 1 - |d|).  A depthwise conv maps cleanly onto the TPU
(dense, fusable, no per-channel gathers — gathers with channel-varying time
indices forced XLA into transposed megabyte temps and OOM'd HBM).  The tap
range k in [-K, K+1] is static; K = MAX_SHIFT bounds |ypos| (the positions
move in fixed 0.01 steps — see backward — so K=8 covers any practical
training run; assert_in_range() lets the trainer check).

Backward — deliberately NOT the true gradient (reference
shift_cuda_kernel.cu:370-395):
- grad_input IS the true conv VJP (the reference's reverse-shift kernels at
  cu:78-256 compute exactly the transposed convolution; verified in tests),
- position "grads" are overwritten by a constraint: grad_x := 0,
  grad_y := 0.01 * sign(gy_raw), or 1e-4 when gy_raw == 0, where gy_raw is
  the corner-difference inner product reduced mean-over-batch then
  sum-over-(T,V) (cu:277-363, 501-509).  Only the sign of gy_raw matters;
  it is computed with a cheap 2-tap difference conv.  So xpos never trains
  and ypos moves in fixed-magnitude steps — load-bearing for parity and
  reproduced exactly via jax.custom_vjp.

Layout: channels-last (N, T, V, C); the reference uses (N, C, T=H, V=W).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from shift_gcn_tpu.ops.lowering import Lowering
from shift_gcn_tpu.ops.lowering import resolve as _resolve_low

# Lowering selection (which impl, tap radius, xpos handling) is an explicit
# per-call `low: Lowering` argument threaded down from the model config
# (ops/lowering.py; env vars SGT_TSHIFT_IMPL / SGT_MAX_SHIFT /
# SGT_EXACT_XPOS remain a process-wide override layer for probes).
#
# Semantics of the knobs:
# - low.tshift_impl: "dft" default — measured on TPU v5e (batch 64, T=300,
#   mediapipe model, dft spatial + bf16 activations, probe33): dft
#   (frequency-domain, handwritten Parseval VJP) trains at 415.7 clips/s
#   vs conv 407.3; eval at least neutral.  ("roll" crashes this platform's
#   remote compile helper — see CLAUDE.md; it remains available for
#   standard backends.)
# - low.max_shift: static temporal tap radius, taps k in [-M, M + 1].
#   Exact as long as ypos stays in [-M, M] (checked by assert_in_range;
#   the trainer checks each checkpoint epoch).  Smaller radius = fewer
#   conv taps = faster, valid while |ypos| stays inside it (|ypos| <= 1 at
#   init, moves in 0.01 steps).
# - low.xpos_zero (default on): lower the joint-axis (xpos) interpolation
#   as the identity, making the shift a pure temporal-tap conv (1/3 the
#   tap work).  Justified by the reference's own semantics: xpos init is
#   U(-1e-8, 1e-8) (shift.py:42), its gradient is hard-zeroed by the
#   constraint kernel (shift_cuda_kernel.cu:386), and weight decay only
#   shrinks it — so |xpos| <= 1e-8 for the entire life of any run and its
#   bilinear contribution is below fp32 rounding.  exact_xpos=True (env
#   SGT_EXACT_XPOS=1) keeps the exact 3-tap joint-axis pass (used by the
#   oracle parity tests, which exercise artificially large xpos).
#
# Back-compat process-global views (import-time env resolution) for tests
# and probes; no op in the package reads these — the radius and impl are
# threaded per call from the model's Lowering (or resolved at trace time
# for low=None callers).
MAX_SHIFT = _resolve_low().max_shift
_DEFAULT_IMPL = Lowering().tshift_impl
ASSUME_XPOS_ZERO = _resolve_low().xpos_zero


def get_impl() -> str:
    """Active temporal-shift lowering (env override or the default)."""
    return _resolve_low().tshift_impl


def _effective(low: Optional[Lowering]) -> Lowering:
    """Resolve the per-call lowering (env > explicit config > defaults).

    "pallas" is dispatched at the model layer (models/shift_gcn.py); an
    op-level call under it falls back to the conv lowering (identical
    semantics)."""
    low = _resolve_low(low)
    if low.tshift_impl == "pallas":
        low = dataclasses.replace(low, tshift_impl="conv")
    return low


def constraint_step(gy_raw: jax.Array) -> jax.Array:
    """The reference constraint kernel's position update
    (shift_cuda_kernel.cu:370-395): a fixed-magnitude 0.01 step in the
    direction of the raw inner product's SIGN, or the 1e-4 epsilon step
    when it is exactly zero.  Shared by every lowering's backward."""
    mag = jnp.abs(gy_raw)
    return jnp.where(mag != 0,
                     gy_raw / jnp.where(mag != 0, mag, 1.0) * 0.01,
                     1e-4)


def _hat_taps(pos: jax.Array, lo: int, hi: int) -> jax.Array:
    """(Q, C) interpolation taps: tap[q, c] = max(0, 1 - |pos[c] - (lo+q)|)."""
    k = jnp.arange(lo, hi + 1, dtype=pos.dtype)[:, None]     # (Q, 1)
    return jnp.maximum(0.0, 1.0 - jnp.abs(pos[None, :] - k))  # (Q, C)


def _floor_taps(pos: jax.Array, lo: int, hi: int) -> jax.Array:
    """(Q, C) difference taps: -1 at floor(pos), +1 at floor(pos)+1.

    Implements the reference position-gradient corner difference
    (shift_cuda_kernel.cu:343-344): d(out)/dy = x[t+y1+1] - x[t+y1],
    using floor semantics (right-derivative at integer pos).
    """
    k = jnp.arange(lo, hi + 1, dtype=jnp.int32)[:, None]
    p1 = jnp.floor(pos).astype(jnp.int32)[None, :]
    return (k == p1 + 1).astype(pos.dtype) - (k == p1).astype(pos.dtype)


def _shift_conv_dw(
    x: jax.Array,
    taps_t: jax.Array,
    taps_v: jax.Array,
    stride: int,
    t_lo: int,
) -> jax.Array:
    """Depthwise conv over (T, V) with per-channel separable taps.

    x: (N, T, V, C); taps_t: (Qt, C); taps_v: (Qv, C) with v taps anchored
    at -1.  Tap k=t_lo+q reads x[t*stride + k].
    """
    n, t_in, v_in, c = x.shape
    qt = taps_t.shape[0]
    t_out = t_in // stride
    pad_t_lo = -t_lo
    pad_t_hi = (t_out - 1) * stride + qt + t_lo - t_in
    if taps_v is None:  # xpos treated as exactly 0: temporal taps only
        kernel = taps_t[:, None, None, :].astype(x.dtype)  # (Qt, 1, 1, C)
        pad_v = 0
    else:
        kernel = (taps_t[:, None, None, :]
                  * taps_v[None, :, None, :]).astype(x.dtype)  # (Qt,Qv,1,C)
        pad_v = 1  # v taps are {-1, 0, 1}
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(stride, 1),
        padding=((pad_t_lo, pad_t_hi), (pad_v, pad_v)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        preferred_element_type=x.dtype,
    )


def _shift_conv_slices(
    x: jax.Array,
    taps_t: jax.Array,
    taps_v: jax.Array,
    stride: int,
    t_lo: int,
) -> jax.Array:
    """Same contraction as `_shift_conv_dw` via explicit shifted-slice FMAs.

    Separable: first the 3-tap joint-axis pass, then the Qt-tap temporal
    pass over strided slices of the zero-padded input.  Every term is an
    elementwise multiply-add that XLA fuses into a single pass — no conv op
    in the graph (robust where the depthwise-conv lowering is fragile, and
    bandwidth-equivalent after fusion).
    """
    n, t_in, v_in, c = x.shape
    qt = taps_t.shape[0]
    t_out = t_in // stride

    # joint-axis pass: taps anchored at {-1, 0, +1} (skipped when xpos==0)
    if taps_v is None:
        h = x
    else:
        xv = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)))
        h = sum(
            jax.lax.slice_in_dim(xv, j, j + v_in, axis=2) * taps_v[j]
            for j in range(taps_v.shape[0]))

    # temporal pass: tap q reads h[t*stride + t_lo + q]
    pad_lo = -t_lo
    pad_hi = max((t_out - 1) * stride + qt + t_lo - t_in, 0)
    hp = jnp.pad(h, ((0, 0), (pad_lo, pad_hi), (0, 0), (0, 0)))
    out = None
    for q in range(qt):
        sl = jax.lax.slice(
            hp, (0, q, 0, 0),
            (n, q + (t_out - 1) * stride + 1, v_in, c),
            (1, stride, 1, 1))
        term = sl * taps_t[q]
        out = term if out is None else out + term
    return out


def _shift_roll(
    x: jax.Array,
    pos: jax.Array,
    taps_v: Optional[jax.Array],
    stride: int,
    span: int,
    mode: str = "hat",
) -> jax.Array:
    """Temporal shift via dynamic per-channel integer rolls + 2-tap combine.

    The hat taps are bilinear: at most two adjacent temporal taps are
    nonzero per channel, yet the conv lowering pays for all 2*span+2 taps.
    Here the integer part of the shift becomes a per-channel roll —
    decomposed into ~log2(span) conditional fixed shifts on the zero-padded
    time axis (roll amounts are traced; the masks are `where` selects over
    the channel axis) — and the fractional part a two-slice lerp
    (mode="hat") or difference (mode="diff", the position-gradient corner
    difference of shift_cuda_kernel.cu:343-344).
    """
    n, t_in, v_in, c = x.shape
    t_out = t_in // stride
    if taps_v is not None:
        xv = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)))
        x = sum(
            jax.lax.slice_in_dim(xv, j, j + v_in, axis=2) * taps_v[j]
            for j in range(taps_v.shape[0]))

    lo = jnp.floor(pos).astype(jnp.int32)          # (C,) in [-span, span]
    frac = (pos - lo.astype(pos.dtype))            # (C,) in [0, 1)
    amt = lo + span                                # (C,) in [0, 2*span]
    # zero-pad so every read x[t*stride + lo + {0,1}] lands in-bounds;
    # rolls shift in zeros (concat, not circular) so nothing wraps
    pad_lo = span
    pad_hi = max((t_out - 1) * stride + span + 3 - t_in, 0)
    xp = jnp.pad(x, ((0, 0), (pad_lo, pad_hi), (0, 0), (0, 0)))
    # per-channel left-shift by amt: y[i] = xp[i + amt] (zeros beyond)
    y = xp
    step = 1
    while step <= 2 * span:
        shifted = jnp.concatenate(
            [y[:, step:], jnp.zeros_like(y[:, :step])], axis=1)
        bit = (amt // step) % 2 == 1               # (C,) traced bool
        y = jnp.where(bit[None, None, None, :], shifted, y)
        step *= 2
    # y[i] == x_orig[i + lo]; sample the strided window
    y0 = jax.lax.slice(y, (0, 0, 0, 0),
                       (n, (t_out - 1) * stride + 1, v_in, c),
                       (1, stride, 1, 1))
    y1 = jax.lax.slice(y, (0, 1, 0, 0),
                       (n, (t_out - 1) * stride + 2, v_in, c),
                       (1, stride, 1, 1))
    if mode == "diff":
        return y1 - y0
    return y0 * (1.0 - frac) + y1 * frac


def _joint_pass(x: jax.Array, taps_v: Optional[jax.Array]) -> jax.Array:
    """3-tap joint-axis (xpos) interpolation pass shared by the non-conv
    lowerings; identity when xpos is treated as exactly zero."""
    if taps_v is None:
        return x
    v_in = x.shape[2]
    xv = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)))
    return sum(
        jax.lax.slice_in_dim(xv, j, j + v_in, axis=2) * taps_v[j]
        for j in range(taps_v.shape[0]))


def _dft_t_len(t_in: int, m: int) -> int:
    """Padded circle length: no wrap for any |pos| <= m (the tap radius)."""
    return t_in + 2 * (m + 1)


def _dft_point_basis(npts: int, stride: int, off: int, l: int,
                     sign: float) -> jax.Array:
    """(npts, 2F) analysis basis [cos th | sign*sin th] with
    th[p, f] = 2*pi*f*(p*stride + off)/l.

    Angles reduce i*j mod l in integer space for fp32 trig accuracy (see
    `_dft_angle` rationale in ops/spatial_shift.py); built from iotas, not
    dense literals, to keep the MLIR text small for this platform's remote
    compile helper.
    """
    f = l // 2 + 1
    pi_ = jax.lax.broadcasted_iota(jnp.int32, (npts, f), 0) * stride + off
    fi = jax.lax.broadcasted_iota(jnp.int32, (npts, f), 1)
    th = (2.0 * jnp.pi / l) * ((pi_ * fi) % l).astype(jnp.float32)
    return jnp.concatenate([jnp.cos(th), sign * jnp.sin(th)], axis=1)


def _dft_hermitian_weights(l: int) -> jax.Array:
    """(F, 1) irfft fold weights: 2/l except 1/l at DC (and Nyquist, even l)."""
    f = l // 2 + 1
    wgt = jnp.full((f, 1), 2.0 / l, dtype=jnp.float32)
    wgt = wgt.at[0, 0].set(1.0 / l)
    if l % 2 == 0:
        wgt = wgt.at[-1, 0].set(1.0 / l)
    return wgt


def _dft_inv_basis(npts: int, stride: int, off: int, l: int, sign: float):
    """Hermitian-weighted synthesis bases (F, npts): out = Zr@inv_r + Zi@inv_i
    evaluates sum_f w_f * Re(Z[f] * exp(sign*i*th)) directly at the sample
    points p*stride + off — so strided (downsampling) evaluation is free.
    """
    f = l // 2 + 1
    fo = jax.lax.broadcasted_iota(jnp.int32, (f, npts), 0)
    po = jax.lax.broadcasted_iota(jnp.int32, (f, npts), 1) * stride + off
    th = (2.0 * jnp.pi / l) * ((fo * po) % l).astype(jnp.float32)
    wgt = _dft_hermitian_weights(l)
    return wgt * jnp.cos(th), sign * wgt * jnp.sin(th)


def _dft_t_phase(pos: jax.Array, l: int, mode: str):
    """(F, C) complex phase implementing the per-channel fractional shift.

    A read at offset k multiplies the spectrum by E(k)[f] =
    exp(+2*pi*i*f*k/l); the bilinear hat combines the two corners
    (1-a)*E(k0) + a*E(k0+1) with k0 = floor(pos), a = pos - k0 — EXACTLY
    the conv lowering's two nonzero taps, so the result is bit-for-math
    identical to the hat-tap depthwise conv (not a sinc/Fourier
    interpolant).  mode="diff" builds E(k0+1) - E(k0), the position-
    gradient corner difference (reference shift_cuda_kernel.cu:343-344).
    """
    f = l // 2 + 1
    k0 = jnp.floor(pos).astype(jnp.int32)                       # (C,)
    fi = jax.lax.broadcasted_iota(jnp.int32, (f, pos.shape[0]), 0)
    k0m = k0 % l
    th0 = (2.0 * jnp.pi / l) * ((fi * k0m[None, :]) % l).astype(jnp.float32)
    th1 = (2.0 * jnp.pi / l) * (
        (fi * ((k0m + 1) % l)[None, :]) % l).astype(jnp.float32)
    if mode == "diff":
        return jnp.cos(th1) - jnp.cos(th0), jnp.sin(th1) - jnp.sin(th0)
    a = (pos - k0.astype(pos.dtype)).astype(jnp.float32)[None, :]
    pr = (1.0 - a) * jnp.cos(th0) + a * jnp.cos(th1)
    pi = (1.0 - a) * jnp.sin(th0) + a * jnp.sin(th1)
    return pr, pi


def _shift_dft(
    x: jax.Array,
    pos: jax.Array,
    taps_v: Optional[jax.Array],
    stride: int,
    m: int,
    mode: str = "hat",
) -> jax.Array:
    """Temporal shift evaluated in the time-axis Fourier basis (MXU path).

    The fractional shift is a per-channel linear-shift-invariant map, so on
    a zero-padded length-l circle it is an elementwise phase multiply
    between one shared rfft basis matmul and one shared inverse matmul —
    the same shared-basis + per-channel-twiddle structure that makes the
    spatial `dft` lowering win (ops/spatial_shift.py).  l = T + 2*(M+1)
    guarantees no circular wrap for any |pos| <= M, making this exactly the
    zero-padded hat-tap conv semantics.  vs the depthwise-conv lowering the
    work moves from a bandwidth-bound 2(M+1)-tap VPU pass onto two dense
    matmuls the MXU executes directly; the inverse basis is evaluated at
    the strided output samples so stride-2 needs no extra step.
    """
    t_in = x.shape[1]
    x = _joint_pass(x, taps_v)
    l = _dft_t_len(t_in, m)
    xh = _dft_spectrum(x, l, m)
    return _dft_apply(xh, pos, stride, t_in, l, m, mode)


def _dft_spectrum(x: jax.Array, l: int, m: int) -> jax.Array:
    """(N, 2F, V, C) real rfft of the zero-padded time axis, as one matmul
    against the (T_in, 2F) analysis basis (padding offset folded in)."""
    basis = _dft_point_basis(
        x.shape[1], 1, m, l, -1.0).astype(x.dtype)
    return jnp.einsum("ntvc,tf->nfvc", x, basis,
                      preferred_element_type=x.dtype)


def _dft_apply(xh: jax.Array, pos: jax.Array, stride: int, t_in: int,
               l: int, m: int, mode: str = "hat") -> jax.Array:
    """Phase-twiddle the spectrum and synthesize at the strided outputs."""
    f = l // 2 + 1
    pr, pi = (a.astype(xh.dtype) for a in _dft_t_phase(pos, l, mode))
    xr, xi = xh[:, :f], xh[:, f:]
    zr = xr * pr[None, :, None, :] - xi * pi[None, :, None, :]
    zi = xr * pi[None, :, None, :] + xi * pr[None, :, None, :]
    inv_r, inv_i = (a.astype(xh.dtype) for a in _dft_inv_basis(
        t_in // stride, stride, m, l, -1.0))
    return (jnp.einsum("nfvc,fs->nsvc", zr, inv_r,
                       preferred_element_type=xh.dtype)
            + jnp.einsum("nfvc,fs->nsvc", zi, inv_i,
                         preferred_element_type=xh.dtype))


def _dft_shift_bwd(xh: jax.Array, ypos_eff: jax.Array, stride: int,
                   g: jax.Array, t_in: int, m: int):
    """Handwritten VJP of the dft lowering: (grad_input, gy_raw).

    One analysis matmul of the cotangent G+[f] = sum_s g[s] e^{+i a_f p_s}
    serves BOTH outputs:
    - grad_input[t] = sum_f w_f Re(phi[f] G+[f] e^{-i a_f (t+M)}) — the
      exact transpose of forward (phase multiply + synthesis at the input
      sample points; the reference's reverse-shift kernels compute the same
      transposed map, shift_cuda_kernel.cu:78-256),
    - the raw constraint inner product collapses to an ELEMENTWISE reduce
      against the saved forward spectrum (Parseval — no second pass over
      the data): sum_s dval[s]*g[s] = sum_f w_f Re(psi[f] X[f] G+[f]),
      psi the corner-difference phase (cu:343-349, 501-509).
    The generic path pays ~6 basis matmuls (vjp transpose + a full second
    dft for dval); this pays 2 plus elementwise work — measured the
    difference between the dft lowering losing and winning at train time.
    """
    n = g.shape[0]
    l = _dft_t_len(t_in, m)
    f = l // 2 + 1
    gb = _dft_point_basis(
        g.shape[1], stride, m, l, 1.0).astype(g.dtype)
    gh = jnp.einsum("nsvc,sf->nfvc", g, gb,
                    preferred_element_type=g.dtype)             # G+ planes
    gr, gi = gh[:, :f], gh[:, f:]
    pr, pi = (a.astype(g.dtype) for a in _dft_t_phase(ypos_eff, l, "hat"))
    zr = gr * pr[None, :, None, :] - gi * pi[None, :, None, :]
    zi = gr * pi[None, :, None, :] + gi * pr[None, :, None, :]
    inv_r, inv_i = (a.astype(g.dtype)
                    for a in _dft_inv_basis(t_in, 1, m, l, 1.0))
    grad_input = (jnp.einsum("nfvc,ft->ntvc", zr, inv_r,
                             preferred_element_type=g.dtype)
                  + jnp.einsum("nfvc,ft->ntvc", zi, inv_i,
                               preferred_element_type=g.dtype))

    # gy_raw in fp32 (only its SIGN survives the constraint)
    dr, di = _dft_t_phase(ypos_eff, l, "diff")                  # fp32 (F, C)
    xr32 = xh[:, :f].astype(jnp.float32)
    xi32 = xh[:, f:].astype(jnp.float32)
    gr32 = gr.astype(jnp.float32)
    gi32 = gi.astype(jnp.float32)
    re_xg = xr32 * gr32 - xi32 * gi32
    im_xg = xr32 * gi32 + xi32 * gr32
    wv = _dft_hermitian_weights(l)[:, 0]                        # (F,)
    contrib = (dr[None, :, None, :] * re_xg
               - di[None, :, None, :] * im_xg)
    gy_raw = jnp.sum(wv[None, :, None, None] * contrib,
                     axis=(0, 1, 2)) / n
    return grad_input, gy_raw


def _shift_matmul(
    x: jax.Array,
    pos: jax.Array,
    taps_v: Optional[jax.Array],
    stride: int,
    mode: str = "hat",
) -> jax.Array:
    """Temporal shift as a batched (C, T_out, T_in) hat-matrix contraction.

    The per-channel fractional shift is a linear map over time, so it can
    be materialised as one small matrix per channel,

        M[c, s, t] = hat(s * stride + pos[c] - t),   hat(d) = max(0, 1-|d|)

    (2 nonzeros per row; out-of-range reads vanish because the column
    simply doesn't exist — identical to the conv lowering's zero padding),
    and applied as ``out[n,s,v,c] = sum_t x[n,t,v,c] * M[c,s,t]``.  This
    turns the shift from a many-tap depthwise conv (VPU, bandwidth-bound)
    into a dense batched matmul the MXU executes directly; M is tiny
    (C * T^2, ~23 MB at the largest block) next to the activations.
    mode="diff" builds the position-gradient corner-difference matrix
    instead (reference shift_cuda_kernel.cu:343-344).
    """
    n, t_in, v_in, c = x.shape
    t_out = t_in // stride
    if taps_v is not None:
        xv = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)))
        x = sum(
            jax.lax.slice_in_dim(xv, j, j + v_in, axis=2) * taps_v[j]
            for j in range(taps_v.shape[0]))
    s = jnp.arange(t_out, dtype=jnp.int32)[None, :, None] * stride
    t = jnp.arange(t_in, dtype=jnp.int32)[None, None, :]
    if mode == "diff":
        y1 = jnp.floor(pos).astype(jnp.int32)[:, None, None]
        m = ((t == s + y1 + 1).astype(x.dtype)
             - (t == s + y1).astype(x.dtype))
    else:
        d = s.astype(pos.dtype) + pos[:, None, None] - t.astype(pos.dtype)
        m = jnp.maximum(0.0, 1.0 - jnp.abs(d)).astype(x.dtype)
    return jnp.einsum("ntvc,cst->nsvc", x, m,
                      preferred_element_type=x.dtype)


def _shift_conv(x, taps_t, taps_v, stride, t_lo, impl="conv"):
    # Direct-lowering choice (measured on TPU v5e, batch 64, T=300):
    #   conv : train 193 clips/s, eval 683 clips/s
    #   slice: eval 277 clips/s, backward OOMs at batch 64
    # (both are superseded by the frequency-domain default, probe33)
    # (the "roll" impl is dispatched in _forward/_backward, not here)
    # Known platform issue: at very small T (T//4 < tap window) the eval
    # graph faults the remote TPU worker under BOTH lowerings; use T >= 128
    # on this platform (standard clips are T=300).
    if impl == "slice":
        return _shift_conv_slices(x, taps_t, taps_v, stride, t_lo)
    return _shift_conv_dw(x, taps_t, taps_v, stride, t_lo)


def _forward(x: jax.Array, xpos: jax.Array, ypos_eff: jax.Array,
             stride: int, low: Lowering) -> jax.Array:
    m = low.max_shift
    taps_v = None if low.xpos_zero else _hat_taps(xpos, -1, 1)
    impl = low.tshift_impl
    if impl == "roll":
        return _shift_roll(x, ypos_eff, taps_v, stride, m)
    if impl == "matmul":
        return _shift_matmul(x, ypos_eff, taps_v, stride)
    if impl == "dft":
        return _shift_dft(x, ypos_eff, taps_v, stride, m)
    taps_t = _hat_taps(ypos_eff, -m, m + 1)
    return _shift_conv(x, taps_t, taps_v, stride, -m, impl)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def temporal_shift(
    x: jax.Array, xpos: jax.Array, ypos: jax.Array, stride: int = 1,
    low: Optional[Lowering] = None,
) -> jax.Array:
    """Learnable fractional temporal shift.

    Args:
      x: (N, T, V, C) input.
      xpos: (C,) per-channel joint-axis shift (effectively ~0 in practice).
      ypos: (C,) per-channel temporal shift, |ypos| <= low.max_shift.
      stride: temporal stride (output T = T // stride). For stride != 1 the
        effective ypos is ypos + 0.5 (reference shift.py:17-19).
      low: lowering selection (static; ops/lowering.py).  None resolves
        from the SGT_* environment overrides / defaults at trace time.

    Returns:
      (N, T // stride, V, C).
    """
    low = _effective(low)
    ypos_eff = ypos if stride == 1 else ypos + 0.5
    return _forward(x, xpos, ypos_eff, stride, low)


def _temporal_shift_fwd(x, xpos, ypos, stride, low):
    low = _effective(low)
    ypos_eff = ypos if stride == 1 else ypos + 0.5
    if low.tshift_impl == "dft" and low.xpos_zero:
        # dft fast path: compute the spectrum ONCE, save it for the
        # handwritten backward (x itself is an op input, so keeping it in
        # the residuals costs nothing extra)
        l = _dft_t_len(x.shape[1], low.max_shift)
        xh = _dft_spectrum(x, l, low.max_shift)
        out = _dft_apply(xh, ypos_eff, stride, x.shape[1], l, low.max_shift)
        return out, (x, xh, xpos, ypos_eff)
    out = _forward(x, xpos, ypos_eff, stride, low)
    return out, (x, None, xpos, ypos_eff)


def _temporal_shift_bwd(stride, low, residuals, g):
    low = _effective(low)
    m = low.max_shift
    x, xh, xpos, ypos_eff = residuals

    if xh is not None:  # dft fast path (see _dft_shift_bwd)
        grad_input, gy_raw = _dft_shift_bwd(
            xh, ypos_eff, stride, g, x.shape[1], m)
        gy = constraint_step(gy_raw)
        return grad_input, jnp.zeros_like(xpos), gy.astype(ypos_eff.dtype)

    # grad_input: true VJP of the depthwise conv w.r.t. x (the reference's
    # reverse-shift kernels compute exactly this transposed conv).
    _, vjp_fn = jax.vjp(
        lambda xx: _forward(xx, xpos, ypos_eff, stride, low), x)
    grad_input, = vjp_fn(g)

    # raw position grad along y: corner-difference conv then
    # mean-over-batch, sum-over-(T, V) (cu:343-349, 501-509).
    taps_v = None if low.xpos_zero else _hat_taps(xpos, -1, 1)
    _impl = low.tshift_impl
    if _impl == "roll":
        dval_y = _shift_roll(x, ypos_eff, taps_v, stride, m,
                             mode="diff")
    elif _impl == "matmul":
        dval_y = _shift_matmul(x, ypos_eff, taps_v, stride, mode="diff")
    elif _impl == "dft":
        dval_y = _shift_dft(x, ypos_eff, taps_v, stride, m, mode="diff")
    else:
        dtaps_t = _floor_taps(ypos_eff, -m, m + 1)
        dval_y = _shift_conv(x, dtaps_t, taps_v, stride, -m, _impl)
    # fp32 reduction: only the SIGN of gy_raw matters (constraint), so the
    # inner product must not lose it to low-precision accumulation
    gy_raw = jnp.sum(jnp.mean(
        (dval_y * g).astype(jnp.float32), axis=0), axis=(0, 1))

    # constraint (cu:370-395): fixed-magnitude steps, xpos frozen.
    gy = constraint_step(gy_raw)
    gx = jnp.zeros_like(xpos)
    return grad_input, gx, gy


temporal_shift.defvjp(_temporal_shift_fwd, _temporal_shift_bwd)


def _tsl_dft_forward(xh: jax.Array, ypos: jax.Array, w: jax.Array,
                     bias: jax.Array, t_in: int, l: int,
                     m: int) -> jax.Array:
    """Fused stride-1 shift + pointwise linear in the Fourier basis.

    The channel-mixing 1x1 conv is pointwise over time, so in the
    frequency domain it applies per frequency to both real/imag planes:
    out = synth(twiddle(X) @ W) + bias — one shared analysis/synthesis
    pair replaces the shift's pair PLUS the separate time-domain matmul
    (one fewer matmul and one fewer (N,T,V,C) materialization per block
    than shift-then-conv).
    """
    f = l // 2 + 1
    pr, pi = (a.astype(xh.dtype) for a in _dft_t_phase(ypos, l, "hat"))
    xr, xi = xh[:, :f], xh[:, f:]
    zr = xr * pr[None, :, None, :] - xi * pi[None, :, None, :]
    zi = xr * pi[None, :, None, :] + xi * pr[None, :, None, :]
    wd = w.astype(xh.dtype)
    zcr = jnp.einsum("nfvc,cd->nfvd", zr, wd,
                     preferred_element_type=xh.dtype)
    zci = jnp.einsum("nfvc,cd->nfvd", zi, wd,
                     preferred_element_type=xh.dtype)
    inv_r, inv_i = (a.astype(xh.dtype) for a in _dft_inv_basis(
        t_in, 1, m, l, -1.0))
    out = (jnp.einsum("nfvd,fs->nsvd", zcr, inv_r,
                      preferred_element_type=xh.dtype)
           + jnp.einsum("nfvd,fs->nsvd", zci, inv_i,
                        preferred_element_type=xh.dtype))
    return out + bias.reshape(1, 1, 1, -1).astype(xh.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def temporal_shift_linear_dft(
    x: jax.Array, xpos: jax.Array, ypos: jax.Array,
    w: jax.Array, bias: jax.Array, low: Optional[Lowering] = None,
) -> jax.Array:
    """`pointwise(temporal_shift(x, ., ypos, 1), w, bias)` evaluated in one
    shared Fourier-basis pass (see `_tsl_dft_forward`); requires the
    xpos-zero lowering.  Numerically identical (to fp roundoff) to the
    shift-then-conv composition: the twiddle IS the hat-tap shift
    (`_dft_t_phase` docstring), and the channel matmul commutes with the
    synthesis because it is pointwise over time.

    Gradients: true VJPs for x / w / bias; ypos follows the reference
    constraint kernel (shift_cuda_kernel.cu:370-395) with the raw sign
    taken at the shift-output cotangent g @ W^T — computed in the
    frequency domain via the same Parseval trick as `_dft_shift_bwd`
    (GW = G+ @ W^T replaces G+ there; algebra in _tsl_dft_bwd).
    """
    m = _effective(low).max_shift
    l = _dft_t_len(x.shape[1], m)
    xh = _dft_spectrum(x, l, m)
    return _tsl_dft_forward(xh, ypos, w, bias, x.shape[1], l, m)


def _tsl_dft_fwd(x, xpos, ypos, w, bias, low):
    m = _effective(low).max_shift
    l = _dft_t_len(x.shape[1], m)
    xh = _dft_spectrum(x, l, m)
    out = _tsl_dft_forward(xh, ypos, w, bias, x.shape[1], l, m)
    return out, (xh, xpos, ypos, w, x.shape[1])


def _tsl_dft_bwd(low, residuals, g):
    """Derivation (per (n, v) slice, complex planes; a = 2*pi/l, offset M
    folded into every basis):  forward is out[s,d] =
    sum_f w_f Re(ZC[f,d] e^{+i a f (s+M)}) + bias, ZC = (X.P) W with
    X = analysis(x) (e^{-i} basis), P the hat phase.  Adjoints:

      dZC = w_f conj(G+),        G+[f,d] = sum_s g[s,d] e^{+i a f (s+M)}
      dW[c,d] = sum_{n,v,f} w_f Re(Z[f,c] G+[f,d]),   Z = X.P
      dX = conj(P) . dZ = w_f conj(P . GW),           GW = G+ W^T
      dx[t] = sum_f Re(dX e^{+i a f (t+M)})
            = sum_f w_f Re(P GW e^{-i a f (t+M)})

    — dx is exactly `_dft_shift_bwd`'s grad_input with GW in place of
    G+, and the constraint inner product likewise Parsevals against the
    saved spectrum with GW (the shift-output cotangent in freq space).
    """
    m = _effective(low).max_shift
    xh, xpos, ypos, w, t_in = residuals
    n = g.shape[0]
    l = _dft_t_len(t_in, m)
    f = l // 2 + 1

    grad_bias = jnp.sum(g, axis=(0, 1, 2)).astype(w.dtype)

    gb = _dft_point_basis(g.shape[1], 1, m, l, 1.0).astype(g.dtype)
    gh = jnp.einsum("nsvd,sf->nfvd", g, gb,
                    preferred_element_type=g.dtype)
    gr, gi = gh[:, :f], gh[:, f:]                       # G+ planes

    # grad_W: sum_f w_f Re(Z G+), Z recomputed from the saved spectrum by
    # the (elementwise) twiddle
    pr, pi = (a.astype(xh.dtype) for a in _dft_t_phase(ypos, l, "hat"))
    xr, xi = xh[:, :f], xh[:, f:]
    zr = xr * pr[None, :, None, :] - xi * pi[None, :, None, :]
    zi = xr * pi[None, :, None, :] + xi * pr[None, :, None, :]
    wv = _dft_hermitian_weights(l)[:, 0].astype(jnp.float32)    # (F,)
    wgr = (gr.astype(jnp.float32)
           * wv[None, :, None, None]).astype(g.dtype)
    wgi = (gi.astype(jnp.float32)
           * wv[None, :, None, None]).astype(g.dtype)
    grad_w = (jnp.einsum("nfvc,nfvd->cd", zr, wgr,
                         preferred_element_type=jnp.float32)
              - jnp.einsum("nfvc,nfvd->cd", zi, wgi,
                           preferred_element_type=jnp.float32)
              ).astype(w.dtype)

    # shift-output cotangent in freq space: GW = G+ @ W^T
    wd = w.astype(g.dtype)
    gwr = jnp.einsum("nfvd,cd->nfvc", gr, wd,
                     preferred_element_type=g.dtype)
    gwi = jnp.einsum("nfvd,cd->nfvc", gi, wd,
                     preferred_element_type=g.dtype)

    # grad_input: twiddle GW by P, synthesize at input points (sign +1)
    tzr = gwr * pr[None, :, None, :] - gwi * pi[None, :, None, :]
    tzi = gwr * pi[None, :, None, :] + gwi * pr[None, :, None, :]
    inv_r, inv_i = (a.astype(g.dtype)
                    for a in _dft_inv_basis(t_in, 1, m, l, 1.0))
    grad_x = (jnp.einsum("nfvc,ft->ntvc", tzr, inv_r,
                         preferred_element_type=g.dtype)
              + jnp.einsum("nfvc,ft->ntvc", tzi, inv_i,
                           preferred_element_type=g.dtype))

    # constraint: gy_raw = sum_f w_f (dr Re(X GW) - di Im(X GW)) / n
    dr, di = _dft_t_phase(ypos, l, "diff")              # fp32 (F, C)
    xr32, xi32 = xr.astype(jnp.float32), xi.astype(jnp.float32)
    gwr32, gwi32 = gwr.astype(jnp.float32), gwi.astype(jnp.float32)
    re_xg = xr32 * gwr32 - xi32 * gwi32
    im_xg = xr32 * gwi32 + xi32 * gwr32
    contrib = dr[None, :, None, :] * re_xg - di[None, :, None, :] * im_xg
    gy_raw = jnp.sum(wv[None, :, None, None] * contrib,
                     axis=(0, 1, 2)) / n
    gy = constraint_step(gy_raw)
    return (grad_x, jnp.zeros_like(xpos), gy.astype(ypos.dtype),
            grad_w, grad_bias)


temporal_shift_linear_dft.defvjp(_tsl_dft_fwd, _tsl_dft_bwd)


def _fused_conv(x: jax.Array, taps_t: jax.Array, w: jax.Array,
                bias: jax.Array, m: int) -> jax.Array:
    """out = pointwise(temporal_shift(x)) as ONE dense temporal conv.

    x: (N, T, V, C); taps_t: (Qt, C); w: (C, D).  Kernel
    K[k, 0, c, d] = taps_t[k, c] * w[c, d] — the per-channel shift taps
    scattered into the channel-mixing conv, so the whole
    shift→1x1-matmul chain runs as one implicit-GEMM conv on the MXU
    instead of a bandwidth-bound depthwise pass followed by a matmul.
    """
    qt = taps_t.shape[0]
    kernel = (taps_t[:, None, :, None] * w[None, None, :, :]).astype(x.dtype)
    pad_lo = m
    pad_hi = qt - m - 1
    # dtype-uniform conv (XLA's conv transpose rule rejects mixed
    # bf16-operand/f32-cotangent convs); caller keeps x.dtype downstream
    out = jax.lax.conv_general_dilated(
        x, kernel,
        window_strides=(1, 1),
        padding=((pad_lo, pad_hi), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype)
    return out + bias.reshape(1, 1, 1, -1).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def temporal_shift_linear(
    x: jax.Array, xpos: jax.Array, ypos: jax.Array,
    w: jax.Array, bias: jax.Array, low: Optional[Lowering] = None,
) -> jax.Array:
    """Fused stride-1 temporal shift + pointwise linear.

    Equivalent to ``pointwise(temporal_shift(x, xpos, ypos, 1), w, bias)``
    (reference: Shift_tcn's shift_in then temporal_linear,
    model/shift_gcn.py:66-69) in a single MXU conv.  Requires the
    xpos-zero lowering (ASSUME_XPOS_ZERO); falls back implicitly since
    callers gate on that flag.

    Gradients: true VJPs for x / w / bias (the reference backpropagates
    normally through the conv, main.py:412-414); position grads follow the
    constraint kernel — xpos := 0, ypos := ±0.01 fixed-magnitude steps
    (shift_cuda_kernel.cu:370-395) with the raw sign taken from the
    corner-difference inner product at the *shift output* cotangent
    (i.e. grad w.r.t. the pre-matmul activation, g @ W^T).
    """
    m = _effective(low).max_shift
    taps_t = _hat_taps(ypos, -m, m + 1)
    return _fused_conv(x, taps_t, w, bias, m)


def _tsl_fwd(x, xpos, ypos, w, bias, low):
    return (temporal_shift_linear(x, xpos, ypos, w, bias, low),
            (x, xpos, ypos, w))


def _tsl_bwd(low, residuals, g):
    low = _effective(low)
    m = low.max_shift
    x, xpos, ypos, w = residuals
    taps_t = _hat_taps(ypos, -m, m + 1)

    # true grads for x / w / bias through the conv, taps held constant
    _, vjp_fn = jax.vjp(
        lambda xx, ww, bb: _fused_conv(xx, taps_t, ww, bb, m),
        x, w, jnp.zeros((w.shape[1],), x.dtype))
    grad_x, grad_w, grad_b = vjp_fn(g)
    # cotangent dtypes must match the (fp32) parameter primals even when
    # activations run in a lower precision
    grad_w = grad_w.astype(w.dtype)
    grad_b = grad_b.astype(w.dtype)

    # constraint ypos grad: cotangent at the shift output is g @ W^T
    g_h = jnp.einsum("ntvd,cd->ntvc", g, w,
                     preferred_element_type=jnp.float32)
    dtaps_t = _floor_taps(ypos, -m, m + 1)
    dval_y = _shift_conv(x, dtaps_t, None, 1, -m,
                         low.tshift_impl if low.tshift_impl == "slice"
                         else "conv")
    gy_raw = jnp.sum(jnp.mean(
        (dval_y * g_h).astype(jnp.float32), axis=0), axis=(0, 1))
    gy = constraint_step(gy_raw)
    gx_pos = jnp.zeros_like(xpos)
    return grad_x, gx_pos, gy, grad_w, grad_b


temporal_shift_linear.defvjp(_tsl_fwd, _tsl_bwd)


def _tap_support(taps: jax.Array, t: int, m: int) -> jax.Array:
    """(T, C) fp32 response of the tap stencil to an all-ones input.

    chi[q, t] = [0 <= t - m + q < T] marks taps that read
    in-bounds (the conv zero-pads the rest); m[t, c] = sum_q
    taps[q, c] * chi[q, t].  This is temporal_shift(ones) without
    touching a batch-sized tensor.
    """
    q = taps.shape[0]
    tq = (jnp.arange(t, dtype=jnp.int32)[None, :]
          + jnp.arange(q, dtype=jnp.int32)[:, None] - m)
    chi = ((tq >= 0) & (tq < t)).astype(taps.dtype)        # (Q, T)
    return jnp.einsum("qc,qt->tc", taps, chi)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def bn_shift_linear(
    x: jax.Array, a: jax.Array, b: jax.Array, ypos: jax.Array,
    w: jax.Array, bias: jax.Array, low: Optional[Lowering] = None,
) -> jax.Array:
    """Fused BN-affine + stride-1 temporal shift + pointwise linear.

    Computes ``pointwise(temporal_shift(x*a + b, 0, ypos, 1), w, bias)``
    — the reference Shift_tcn prefix bn → shift_in → temporal_linear
    (model/shift_gcn.py:66-69) — WITHOUT materializing the normalized
    tensor: per-channel affines commute with the per-channel temporal
    shift, so

        shift(x*a + b) = a * shift(x) + b * m,   m[t,c] = shift(ones)

    (m differs from 1 only where taps cross the zero-padded boundary),
    and the matmul absorbs both terms:

        out = shift(x) @ (a*W) + (m * b) @ W + bias

    shift runs on RAW x and the affine rides the (C, D) weights plus a
    tiny (T, D) bias plane — the BN normalize pass (one full HBM
    read+write, which XLA cannot fuse past the conv boundary) disappears.
    `a`/`b` come from `ops.batchnorm.bn_affine_coeffs`; gradients to them
    chain back to BN weight/bias/batch-stats outside this op.

    Gradients: true VJPs for x / a / b / w / bias; ypos follows the
    reference constraint kernel (shift_cuda_kernel.cu:370-395) with the
    raw sign taken at the *shift output* cotangent exactly as the
    unfused graph sees it: d/dy shift(bn(x)) = a*dval(x) + b*dval(ones),
    i.e. including the affine's boundary term (dval(ones) is nonzero only
    where the corner-difference stencil crosses the padding).
    Requires the xpos-zero lowering; xpos is frozen (zero grad) upstream.
    """
    low = _effective(low)
    k, impl = low.max_shift, low.tshift_impl
    impl = impl if impl == "slice" else "conv"
    taps_t = _hat_taps(ypos, -k, k + 1)
    h = _shift_conv(x, taps_t.astype(x.dtype), None, 1, -k, impl)
    m = _tap_support(taps_t, x.shape[1], k)                # (T, C) fp32
    wa = a[:, None] * w                                    # (C, D) fp32
    out = jnp.einsum("ntvc,cd->ntvd", h, wa.astype(h.dtype),
                     preferred_element_type=jnp.float32)
    mb = (m * b[None, :]) @ w + bias[None, :]              # (T, D) fp32
    return (out + mb[None, :, None, :]).astype(x.dtype)


def _bsl_fwd(x, a, b, ypos, w, bias, low):
    low_eff = _effective(low)
    k, impl = low_eff.max_shift, low_eff.tshift_impl
    impl = impl if impl == "slice" else "conv"
    taps_t = _hat_taps(ypos, -k, k + 1)
    h = _shift_conv(x, taps_t.astype(x.dtype), None, 1, -k, impl)
    m = _tap_support(taps_t, x.shape[1], k)
    wa = a[:, None] * w
    out = jnp.einsum("ntvc,cd->ntvd", h, wa.astype(h.dtype),
                     preferred_element_type=jnp.float32)
    mb = (m * b[None, :]) @ w + bias[None, :]
    out = (out + mb[None, :, None, :]).astype(x.dtype)
    return out, (x, h, a, b, ypos, w)


def _bsl_bwd(low, residuals, g):
    low = _effective(low)
    k = low.max_shift
    impl = low.tshift_impl if low.tshift_impl == "slice" else "conv"
    x, h, a, b, ypos, w = residuals
    n, t = x.shape[0], x.shape[1]

    # cotangent at shift(bn(x)) — what the reference graph propagates into
    # the shift backward (g @ W^T); fp32 for the sign-sensitive reductions
    g_h_ref = jnp.einsum("ntvd,cd->ntvc", g, w.astype(g.dtype),
                         preferred_element_type=jnp.float32)

    # grad_x: true transposed-conv VJP of the raw shift, cotangent scaled
    # by the folded BN scale
    taps_t = _hat_taps(ypos, -k, k + 1)
    _, vjp_fn = jax.vjp(
        lambda xx: _shift_conv(xx, taps_t.astype(xx.dtype), None, 1,
                               -k, impl), x)
    grad_x, = vjp_fn((g_h_ref * a).astype(x.dtype))

    # true grads for the affine coeffs and the linear params
    grad_a = jnp.sum((h.astype(jnp.float32) * g_h_ref),
                     axis=(0, 1, 2))                       # (C,)
    r = jnp.sum(g_h_ref, axis=(0, 2))                      # (T, C)
    m = _tap_support(taps_t, t, k)
    grad_b = jnp.sum(m * r, axis=0)                        # (C,)
    gs = jnp.sum(g.astype(jnp.float32), axis=(0, 2))       # (T, D)
    grad_w = (a[:, None] * jnp.einsum(
        "ntvc,ntvd->cd", h, g, preferred_element_type=jnp.float32)
        + (m * b[None, :]).T @ gs)                         # (C, D)
    grad_bias = jnp.sum(gs, axis=0)                        # (D,)

    # constraint ypos grad — exact reference semantics on the folded
    # graph: dval(bn(x)) = a*dval(x) + b*dval(ones)
    dtaps_t = _floor_taps(ypos, -k, k + 1)
    dval_x = _shift_conv(x, dtaps_t.astype(x.dtype), None, 1, -k, impl)
    main = jnp.sum((dval_x * g_h_ref.astype(dval_x.dtype))
                   .astype(jnp.float32), axis=(0, 1, 2)) / n
    dm = _tap_support(dtaps_t, t, k)                       # (T, C)
    gy_raw = a * main + b * (jnp.sum(dm * r, axis=0) / n)
    gy = constraint_step(gy_raw)

    return (grad_x, grad_a.astype(a.dtype), grad_b.astype(b.dtype),
            gy.astype(ypos.dtype), grad_w.astype(w.dtype),
            grad_bias.astype(w.dtype))


bn_shift_linear.defvjp(_bsl_fwd, _bsl_bwd)


def temporal_shift_inference(
    x: jax.Array, xpos: jax.Array, ypos: jax.Array, stride: int = 1,
    low: Optional[Lowering] = None,
) -> jax.Array:
    """Forward-only path without the custom VJP plumbing (identical output)."""
    ypos_eff = ypos if stride == 1 else ypos + 0.5
    return _forward(x, xpos, ypos_eff, stride, _effective(low))


def assert_in_range(ypos, name: str = "ypos",
                    max_shift: Optional[int] = None) -> None:
    """Host-side check that shift positions stay within the static tap range."""
    import numpy as np

    k = max_shift if max_shift is not None else _resolve_low().max_shift
    m = float(np.max(np.abs(np.asarray(ypos))))
    if m > k - 0.5:
        raise ValueError(
            f"{name} magnitude {m:.2f} approaches the static tap radius "
            f"max_shift={k}; increase lowering.max_shift for this run")
