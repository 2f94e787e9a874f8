"""Fused spatial Shift-GCN block as a Pallas TPU kernel.

The Shift_gcn core (reference: model/shift_gcn.py:121-136) is

    y = P_out( (P_in(x) * gate) @ W + b )

where P_in / P_out are per-channel circular rolls along the joint axis
(out[v,c] = x[(v ± c) mod V, c]).  Under XLA each permutation is a gather —
a fusion barrier — so the chain costs ~4 HBM round trips.  This kernel does
it in ONE pass:

- the per-channel roll is a *shear*: lane c rolls by (c mod V).  Any
  per-lane roll decomposes into ceil(log2 V) conditional fixed rolls
  (binary decomposition of the roll amount), each a cheap VPU
  slice+concat+select entirely in VMEM.  (The roll amount is linear in
  the lane index, which is exactly tpu.dynamic_rotate-with-stride — ONE
  hardware op — but Mosaic rejects it for the unaligned V=33 sublane dim:
  "unsupported unaligned shape", probe20.  Revisit if alignment support
  lands.),
- the pointwise contraction runs on the MXU over the (rows*V, C) view,
- gate multiply and bias add fuse in between.

The backward reuses the same shear machinery (custom_vjp): the reference's
true gradients here are ordinary matmul/permutation transposes — the
non-gradient trickery lives only in the temporal shift op.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_ROW_BLOCK = 256
_INTERPRET = False  # tests flip this to run kernels in interpreter mode

# VMEM budget for one kernel invocation's working set.  16 MB scoped VMEM
# total; the kernel keeps, besides the double-buffered in/out blocks, the
# sheared copy, the f32 matmul result, and ~2 live roll temporaries of the
# output block inside `_perlane_roll_amt` — measured on hardware: the old
# in+out-only accounting OOM'd the scoped allocator by 2.8 MB on the
# (V=33, C=3, D=64) data-layer block.
_VMEM_BLOCK_BUDGET = 14 * 1024 * 1024


def pick_row_block(v: int, c: int, d: int) -> int:
    """Largest power-of-two row block whose working set fits the budget."""
    # 2c+2d: double-buffered in/out pipeline blocks; +c sheared copy;
    # +d matmul result; +6·max(c,d): the Mosaic stack keeps every rolled
    # copy of the ceil(log2 V)~6-step shear loop live, and the shear runs
    # on the input side in the dx kernel (W transposed, c > d there)
    bytes_per_row = v * (3 * c + 3 * d + 6 * max(c, d)) * 4
    rb = _VMEM_BLOCK_BUDGET // bytes_per_row
    rb = 1 << max(5, int(np.floor(np.log2(max(rb, 32)))))
    return int(min(rb, 256))


def _shear_in(vals: jax.Array, v: int) -> jax.Array:
    """out[r, u, c] = vals[r, (u + c) % V, c]."""
    lane = jax.lax.broadcasted_iota(jnp.int32, vals.shape, dimension=2)
    return _perlane_roll_amt(vals, lane % v, v)


def _shear_out(vals: jax.Array, v: int) -> jax.Array:
    """out[r, u, d] = vals[r, (u - d) % V, d]."""
    lane = jax.lax.broadcasted_iota(jnp.int32, vals.shape, dimension=2)
    return _perlane_roll_amt(vals, (v - lane % v) % v, v)


def _perlane_roll_amt(vals: jax.Array, amt: jax.Array, v: int) -> jax.Array:
    y = vals
    bits = max(1, int(np.ceil(np.log2(max(v, 2)))))
    for k in range(bits + 1):
        step = 1 << k
        if step >= v:
            # amounts are < V, so higher bits never fire
            break
        rolled = jnp.roll(y, -step, axis=1)
        y = jnp.where(((amt >> k) & 1) == 1, rolled, y)
    return y


def _fwd_kernel(x_ref, gate_ref, w_ref, b_ref, ogate_ref, out_ref, *,
                v: int):
    """out = shear_out( (shear_in(x) * gate) @ W + b ) * out_gate.

    With out_gate == 1 this is the forward transform; with gate == 1,
    W = W_fwd^T, b = 0, out_gate = shear_out(G) it computes the input
    gradient (permutations distribute over elementwise products), letting
    the backward reuse this one kernel.
    """
    x = x_ref[:]                       # (R_blk, V, C)
    r_blk, _, c = x.shape
    d = w_ref.shape[1]
    h = _shear_in(x, v) * gate_ref[:]
    h2 = h.reshape(r_blk * v, c)
    z = jnp.dot(h2, w_ref[:], preferred_element_type=jnp.float32)
    z = z + b_ref[:]
    z = z.reshape(r_blk, v, d)
    out_ref[:] = (_shear_out(z, v) * ogate_ref[:]).astype(out_ref.dtype)


def _run_fwd(x, gate, w, bias, out_gate, row_block=None):
    v, c = x.shape[1], x.shape[2]
    d = w.shape[1]
    row_block = row_block or pick_row_block(v, c, d)
    x, r = _pad_rows(x, row_block)
    grid = (x.shape[0] // row_block,)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, v=v),
        interpret=_INTERPRET,
        # output follows the activation dtype (bf16-act mode flows bf16
        # through the backbone); the MXU contraction still accumulates f32
        out_shape=jax.ShapeDtypeStruct((x.shape[0], v, d), x.dtype),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((row_block, v, c), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, v, c), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((c, d), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, d), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, v, d), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((row_block, v, d), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=64 * 1024 * 1024),
    )(x, gate, w, bias.reshape(1, -1), out_gate)[:r]


def _run_dx(g, gate, w, row_block):
    """dx via the forward kernel: Pin^{-1}(G . (Pout^{-1}(g) @ W^T)) ==
    _run_fwd(g, 1, W^T, 0, out_gate=shear_out(G)).  (The dedicated dx
    kernel crashed the platform's Mosaic compile helper; this formulation
    compiles and is algebraically identical.)"""
    from shift_gcn_tpu.ops.spatial_shift import spatial_shift

    r, v, d = g.shape
    c = w.shape[0]
    ones_gate = jnp.ones((1, v, d), jnp.float32)
    gate_shifted = spatial_shift(gate, -1)   # (1, V, C)
    return _run_fwd(g, ones_gate, jnp.transpose(w),
                    jnp.zeros((c,), jnp.float32), gate_shifted, row_block)


def _shear_gate_kernel(x_ref, gate_ref, out_ref, *, v: int):
    out_ref[:] = (_shear_in(x_ref[:], v) * gate_ref[:]).astype(out_ref.dtype)


def _run_shear_gate(x, gate, row_block=None):
    v, c = x.shape[1], x.shape[2]
    row_block = row_block or pick_row_block(v, c, c)
    x, r = _pad_rows(x, row_block)
    return pl.pallas_call(
        functools.partial(_shear_gate_kernel, v=v),
        interpret=_INTERPRET,
        out_shape=jax.ShapeDtypeStruct((x.shape[0], v, c), x.dtype),
        grid_spec=pl.GridSpec(
            grid=(x.shape[0] // row_block,),
            in_specs=[
                pl.BlockSpec((row_block, v, c), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, v, c), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((row_block, v, c), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=64 * 1024 * 1024),
    )(x, gate)[:r]


def _pad_rows(x, row_block):
    r = x.shape[0]
    pad = (-r) % row_block
    if pad:
        x = jnp.concatenate(
            [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)
    return x, r


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_shift_gcn(
    x: jax.Array,
    gate: jax.Array,
    w: jax.Array,
    bias: jax.Array,
    row_block: Optional[int] = None,
) -> jax.Array:
    """Fused shift_in -> *gate -> @W + b -> shift_out.

    Args:
      x: (R, V, C) rows = flattened (N*T).
      gate: (V, C) multiplicative gate (tanh(Feature_Mask) + 1).
      w: (C, D); bias: (D,).
      row_block: rows per kernel invocation; None picks the largest
        power-of-two whose tiles fit the VMEM budget.

    Returns:
      (R, V, D) float32.
    """
    ones_out = jnp.ones((1, x.shape[1], w.shape[1]), jnp.float32)
    return _run_fwd(x, gate[None], w, bias, ones_out, row_block)


def _fused_fwd(x, gate, w, bias, row_block):
    return fused_shift_gcn(x, gate, w, bias, row_block), (x, gate, w, bias)


def _fused_bwd(row_block, residuals, g):
    x, gate, w, bias = residuals
    r, v, c = x.shape

    # dx follows g's dtype (= x's: the fwd output dtype tracks x)
    dx = _run_dx(g, gate[None], w, row_block).astype(x.dtype)

    # weight/gate/bias grads via one fused shear recompute + XLA matmuls;
    # param cotangents accumulate and return in the params' own dtype
    h = _run_shear_gate(x, gate[None], row_block)          # shifted*gated x
    gz_full = _run_shear_gate(
        g, jnp.ones((1, v, g.shape[2]), jnp.float32), row_block)
    # gz_full = shear_in(g) == undo of out-shear
    dw = jnp.einsum("rvc,rvd->cd", h, gz_full,
                    preferred_element_type=jnp.float32).astype(w.dtype)
    dbias = jnp.sum(gz_full.astype(jnp.float32),
                    axis=(0, 1)).astype(bias.dtype)
    # dgate = sum_r shear_in(x) * (gz @ W^T); shear_in(x) = h / gate
    gw = jnp.einsum("rvd,cd->rvc", gz_full, w,
                    preferred_element_type=jnp.float32)
    shifted_x = jnp.where(gate[None] != 0, h / gate[None], 0.0)
    dgate = jnp.sum(shifted_x * gw, axis=0).astype(gate.dtype)
    return dx, dgate, dw, dbias


fused_shift_gcn.defvjp(_fused_fwd, _fused_bwd)
