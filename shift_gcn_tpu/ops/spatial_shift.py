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


def spatial_shift(x: jax.Array, direction: int,
                  impl: str | None = None) -> jax.Array:
    """Per-channel circular roll along the joint axis.

    Args:
      x: (..., V, C) array.
      direction: +1 for shift_in, -1 for shift_out.
      impl: "gather" (take_along_axis, default), "roll" (log2(V)
        conditional-roll decomposition — no gather op, only slices/selects
        XLA can fuse), "onehot" (permutation matmul).  None resolves from
        the lowering config / SGT_SSHIFT_IMPL env override
        (ops/lowering.py).

    Returns:
      Shifted array, same shape.
    """
    if impl is None:
        from shift_gcn_tpu.ops.lowering import resolve

        impl = resolve().sshift_impl
    if impl == "roll":
        return spatial_shift_roll(x, direction)
    if impl == "onehot":
        return spatial_shift_onehot(x, direction)
    v, c = x.shape[-2], x.shape[-1]
    idx = jnp.asarray(shift_indices(v, c, direction))
    idx = idx.reshape((1,) * (x.ndim - 2) + (v, c))
    return jnp.take_along_axis(x, idx, axis=-2)


def spatial_shift_roll(x: jax.Array, direction: int) -> jax.Array:
    """`spatial_shift` via binary roll decomposition.

    The per-channel roll amount a(c) = (direction*c) mod V is static, so
    out[v,c] = x[(v+a(c)) % V, c] decomposes into ceil(log2 V) stages:
    stage k rolls by 2^k and keeps the rolled value only for channels whose
    amount has bit k set.  Every stage is slice+concat+select — ops XLA
    fuses into vector code with no gather (TPU gathers over the
    sublane/lane-tiled (V, C) trailing axes serialize badly).
    """
    v, c = x.shape[-2], x.shape[-1]
    amt = (direction * np.arange(c)) % v  # (C,) static
    y = x
    step = 1
    while step < v:
        mask_np = ((amt // step) % 2) == 1
        if mask_np.any():
            rolled = jnp.roll(y, -step, axis=-2)
            y = jnp.where(jnp.asarray(mask_np), rolled, y)
        step *= 2
    return y


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
    impl: str | None = None,
    sshift_impl: str | None = None,
) -> jax.Array:
    """The core spatial Shift-GCN transform (shift → mask → matmul → shift).

    Matches reference model/shift_gcn.py:121-136 (up to layout): shift_in,
    multiply by gate (tanh(mask)+1), pointwise matmul + bias, shift_out.
    BatchNorm / residual / relu live in the model layer.

    ``impl`` selects the lowering (None resolves from the lowering config
    / SGT_SGCN_IMPL env override, ops/lowering.py): "dft" (default)
    evaluates the circulant in the joint-axis Fourier basis (see
    `shift_gcn_transform_dft`); "circconv" folds the chain into one
    circulant MXU conv with V× dead MACs; "chain" keeps the explicit
    gather→mul→matmul→gather sequence (its two shifts lower per
    ``sshift_impl``).  Measured (TPU v5e, batch 64, T=300, bf16
    activations): dft 410 train / 1297 eval clips/s vs circconv
    303 / 1150; fp32: dft 272/957, circconv 232/1042, chain 218/686
    (probe23, docs/PERF.md).

    Args:
      x: (..., V, C_in).
      weight: (C_in, C_out) — torch `Linear_weight` shape.
      bias: (C_out,) or broadcastable — torch `Linear_bias` is (1, 1, C_out).
      feature_mask: (V, C_in) or broadcastable — torch `Feature_Mask` is
        (1, V, C_in).

    Returns:
      (..., V, C_out).
    """
    if impl is None:
        from shift_gcn_tpu.ops.lowering import resolve

        impl = resolve().sgcn_impl
    if impl == "dft":
        return shift_gcn_transform_dft(
            x, weight, bias, feature_mask, compute_dtype=compute_dtype)
    if impl == "circconv":
        return shift_gcn_transform_circconv(
            x, weight, bias, feature_mask, compute_dtype=compute_dtype)
    h = spatial_shift(x, +1, sshift_impl)
    gate = jnp.tanh(feature_mask.reshape(x.shape[-2], x.shape[-1])) + 1.0
    h = h * gate.astype(h.dtype)
    if compute_dtype is not None:
        h = h.astype(compute_dtype)
    out = jnp.einsum(
        "...vc,cd->...vd", h, weight.astype(h.dtype),
        preferred_element_type=jnp.float32)
    out = out.astype(x.dtype)
    out = out + bias.astype(x.dtype).reshape(
        (1,) * (out.ndim - 1) + (out.shape[-1],))
    return spatial_shift(out, -1, sshift_impl)


def _circulant_mask(v: int, c: int, d: int) -> jax.Array:
    """(V, C, D) 0/1 mask with M[s, c, d] = [s == (c - d) mod V].

    Built in-graph from iotas rather than as a host numpy constant: a dense
    (33, 256, 256) f32 literal prints as ~35 MB of MLIR text, and with 10
    blocks (fwd+bwd) the train-step module reached 58 MB — large enough to
    crash this platform's remote compile helper on the fourstream graph.
    The iota form is a few bytes of IR; XLA folds it at compile time.
    """
    si = jax.lax.broadcasted_iota(jnp.int32, (v, c, d), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (v, c, d), 1)
    di = jax.lax.broadcasted_iota(jnp.int32, (v, c, d), 2)
    return (si == (ci - di) % v).astype(jnp.float32)


def shift_gcn_transform_circconv(
    x: jax.Array,
    weight: jax.Array,
    bias: jax.Array,
    feature_mask: jax.Array,
    *,
    compute_dtype: jnp.dtype | None = None,
) -> jax.Array:
    """The spatial Shift-GCN transform as ONE circulant conv (MXU-native).

    Folding the chain y = P_out((P_in(x) * gate) @ W + b) algebraically:

        y[v,d] = sum_c W[c,d] * x[(v-d+c)%V, c] * gate[(v-d)%V, c]
               = sum_s sum_c K[s,c,d] * u[(v+s)%V, c]

    with u = x ⊙ P_out(gate) and K[s,c,d] = W[c,d]·[s == (c-d) mod V] —
    i.e. a circular 1-D convolution over the joint axis whose kernel is the
    weight matrix scattered along its circulant diagonal.  Both per-channel
    permutations disappear into the conv's index arithmetic: no gathers,
    one implicit-GEMM conv that XLA tiles onto the MXU.  V× more MACs than
    the pointwise matmul, but the MXU is idle in the gather formulation —
    this trades dead FLOPs for the elimination of all permutation traffic.
    Gradients (w.r.t. x, W via the mask, gate) come from ordinary conv/mul
    autodiff — the reference has no trickery in this op (its true autograd
    is used here too: model/shift_gcn.py:121-136 is plain torch).
    """
    v, c = x.shape[-2], x.shape[-1]
    d = weight.shape[-1]
    gate = jnp.tanh(feature_mask.reshape(v, c)) + 1.0
    g2 = spatial_shift(gate[None], -1)[0]                 # (V, C) tiny
    u = x * g2.astype(x.dtype)
    kern = _circulant_mask(v, c, d) * weight[None]        # (V, C, D)
    # compute_dtype (matmul-input casting) is deliberately NOT applied
    # here: the conv must be dtype-uniform (XLA's conv transpose rule
    # rejects mixed bf16-operand/f32-cotangent convs), and casting BOTH
    # operands would also bf16-round the C-axis accumulation — a precision
    # regression vs the chain path's fp32-accumulating einsum.  Low
    # precision for this op comes from activation_dtype instead, where
    # x (and thus the whole uniform conv) is already bf16.
    del compute_dtype
    kern = kern.astype(u.dtype)  # conv must be dtype-uniform
    lead = x.shape[:-2]
    u2 = u.reshape((-1, v, c))
    u_pad = jnp.concatenate([u2, u2[:, : v - 1]], axis=1)  # circular pad
    # conv runs uniformly in the compute dtype (mixed dtypes break the
    # conv transpose rule); MXU accumulation is fp32 regardless.  The
    # result returns to the *input activation* dtype: f32 pipelines get
    # f32 back even under compute_dtype=bf16 (matmul-only casting), while
    # bf16-activation pipelines stay bf16 end to end.
    out = jax.lax.conv_general_dilated(
        u_pad, kern,
        window_strides=(1,),
        padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=u_pad.dtype)                # (R, V, D)
    out = out.astype(x.dtype) + bias.reshape(1, 1, d).astype(x.dtype)
    return out.reshape(lead + (v, d))


def _dft_angle(rows: int, cols: int, v: int) -> jax.Array:
    """(rows, cols) fp32 angle plane 2*pi*i*j/V, built from iotas IN-GRAPH.

    Emitting these planes as dense literals would repeat ~KB-scale
    constants across every block/stream/fwd/bwd use — on this platform
    oversized MLIR text crashes the remote compile helper (same failure
    mode `_circulant_mask` hit; see its docstring).  Iota products are a
    few bytes of IR and XLA folds them at compile time.  i*j stays exact
    in fp32 up to ~16M — far above any (F, C/D/V) product here.
    """
    ri = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
    # reduce i*j mod V in INTEGER space (w^{ij} == w^{ij mod V}): keeps the
    # angle in [0, 2*pi) so fp32 cos/sin stay accurate to ~1e-7 — the
    # unreduced product reaches ~4e3 rad, where fp32 trig loses ~1e-4
    return (2.0 * np.pi / v) * ((ri * ci) % v).astype(jnp.float32)


def _dft_factors(v: int, c: int, d: int):
    """In-graph constant factors for the frequency-domain circulant.

    Real rfft basis (V, F) with F = V//2 + 1, the two twiddle planes
    (F, C) / (F, D), and the Hermitian-weighted irfft basis (F, V).
    All fp32; cast to the compute dtype at use sites.
    """
    f = v // 2 + 1
    th = _dft_angle(v, f, v)                             # (V, F)
    fwd_r = jnp.cos(th)                                  # Re DFT basis
    fwd_i = -jnp.sin(th)                                 # Im DFT basis
    thc = _dft_angle(f, c, v)                            # (F, C): w^{+fc}
    tw1_r = jnp.cos(thc)
    tw1_i = jnp.sin(thc)
    thd = _dft_angle(f, d, v)                            # (F, D): w^{-fd}
    tw2_r = jnp.cos(thd)
    tw2_i = -jnp.sin(thd)
    wgt = jnp.full((f, 1), 2.0 / v, dtype=jnp.float32)   # Hermitian fold
    wgt = wgt.at[0, 0].set(1.0 / v)
    if v % 2 == 0:
        wgt = wgt.at[-1, 0].set(1.0 / v)                 # Nyquist (even V)
    thv = _dft_angle(f, v, v)                            # (F, V)
    inv_r = wgt * jnp.cos(thv)
    inv_i = -wgt * jnp.sin(thv)
    return fwd_r, fwd_i, tw1_r, tw1_i, tw2_r, tw2_i, inv_r, inv_i


def shift_gcn_transform_dft(
    x: jax.Array,
    weight: jax.Array,
    bias: jax.Array,
    feature_mask: jax.Array,
    *,
    compute_dtype: jnp.dtype | None = None,
) -> jax.Array:
    """The spatial Shift-GCN transform as a frequency-domain circulant.

    Same math as `shift_gcn_transform_circconv` — y[v,d] = sum_{s,c}
    K[s,c,d]·u[(v+s)%V,c] with K[s,c,d] = W[c,d]·[s == (c-d) mod V] —
    but evaluated in the joint-axis Fourier basis, where the circulant
    diagonalizes:

        y_hat[f,d] = w^{-fd} · sum_c (u_hat[f,c] · w^{fc}) · W[c,d],
        w = exp(2*pi*i/V)

    The correlation kernel's transform conj(K_hat)[f,c,d] =
    W[c,d]·w^{f(c-d)} factors into per-axis twiddles around the ORIGINAL
    real W, so the whole transform is: rfft over V (one real matmul with a
    (V, 2F) basis), an elementwise (F, C) twiddle, ONE true-size matmul
    (R·2F, C)@(C, D) for both complex planes, an (F, D) twiddle, and an
    irfft matmul — ~16-25x fewer MXU MACs than the circulant conv's V×
    dead-FLOP kernel (which pads W to (V, C, D)).  All ops are plain
    matmuls/elementwise: gradients are ordinary autodiff, exactly like the
    conv lowering (reference model/shift_gcn.py:121-136 is plain torch).
    """
    v, c = x.shape[-2], x.shape[-1]
    d = weight.shape[-1]
    gate = jnp.tanh(feature_mask.reshape(v, c)) + 1.0
    g2 = spatial_shift(gate[None], -1)[0]                 # (V, C) tiny
    u = x * g2.astype(x.dtype)
    del compute_dtype  # as in circconv: precision rides the activation dtype

    fwd_r, fwd_i, tw1_r, tw1_i, tw2_r, tw2_i, inv_r, inv_i = (
        a.astype(u.dtype) for a in _dft_factors(v, c, d))

    lead = x.shape[:-2]
    u2 = u.reshape((-1, v, c))                            # (R, V, C)
    # rfft over the joint axis: one matmul against the stacked basis
    basis = jnp.concatenate([fwd_r, fwd_i], axis=1)       # (V, 2F)
    uh = jnp.einsum("rvc,vf->rfc", u2, basis,
                    preferred_element_type=u2.dtype)      # (R, 2F, C)
    f = v // 2 + 1
    uh_r, uh_i = uh[:, :f], uh[:, f:]
    # twiddle w^{+fc}
    ut_r = uh_r * tw1_r - uh_i * tw1_i
    ut_i = uh_r * tw1_i + uh_i * tw1_r
    # shared real W applied to both planes: ONE (R*2F, C)@(C, D) matmul
    zt = jnp.einsum(
        "rfc,cd->rfd", jnp.concatenate([ut_r, ut_i], axis=1),
        weight.astype(u.dtype), preferred_element_type=u.dtype)
    zt_r, zt_i = zt[:, :f], zt[:, f:]
    # twiddle w^{-fd}
    yh_r = zt_r * tw2_r - zt_i * tw2_i
    yh_i = zt_r * tw2_i + zt_i * tw2_r
    # irfft (Hermitian-weighted real matmul)
    out = (jnp.einsum("rfd,fv->rvd", yh_r, inv_r,
                      preferred_element_type=u.dtype)
           + jnp.einsum("rfd,fv->rvd", yh_i, inv_i,
                        preferred_element_type=u.dtype))
    out = out.astype(x.dtype) + bias.reshape(1, 1, d).astype(x.dtype)
    return out.reshape(lead + (v, d))
