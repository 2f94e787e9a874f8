"""Functional batch normalization with PyTorch-parity semantics.

The reference model uses three BN shapes (all nn.BatchNorm defaults:
momentum=0.1, eps=1e-5, affine, track_running_stats):

- ``data_bn``: BatchNorm1d over M*V*C features, stats over (N, T)
  (reference: model/shift_gcn.py:176, 196-198),
- Shift_gcn ``bn``: BatchNorm1d over V*C_out features, stats over N*T
  (reference: model/shift_gcn.py:99, 137),
- Shift_tcn / residual-tcn BatchNorm2d over C, stats over (N, T, V)
  (reference: model/shift_gcn.py:38, 55-56).

PyTorch details replicated:
- normalization uses *biased* batch variance,
- running_var is updated with the *unbiased* variance (factor n/(n-1)),
- running = (1 - momentum) * running + momentum * batch.

`axis_name` enables cross-replica (sync) BN via psum — the TPU-native
equivalent of what DataParallel does NOT do (the reference computes BN
per-GPU); sync BN is therefore opt-in, with per-replica stats as the
parity-default under data parallelism.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

import os as _os

BNParams = Dict[str, jax.Array]   # weight, bias (feature-shaped)
BNState = Dict[str, jax.Array]    # running_mean, running_var, num_batches_tracked

# Low-precision normalize (lowering.bn_lp / bn_lp_eval; env overrides
# SGT_BN_LP / SGT_BN_LP_EVAL): keep the elementwise normalize pass in the
# activation dtype.  Stats (mean/var/running updates) are always fp32;
# this only changes the big x*a+b pass from "upcast x to fp32, normalize,
# downcast" to a bf16 fused-multiply-add with downcast per-feature
# coefficients.  In-family with activation_dtype=bfloat16 numerics (a, b
# are O(1), bf16 rel err ~4e-3, same as every matmul operand on that
# path); no-op for fp32 x.  Resolved at trace time so tests/configs can
# toggle per-jit.
#
# Measured (scratch/bnlp_r2.log): SLOWER in training (the bf16 FMA breaks
# XLA's BN+neighbor bwd fusions: 312 vs 348 clips/s) but +5% in eval
# (1488 vs 1411) — so training defaults to the fp32 pass and EVAL
# defaults to the bf16 pass (bn_lp_eval=False / SGT_BN_LP_EVAL=0 restores
# fp32 eval).
def _lp_normalize() -> bool:
    from shift_gcn_tpu.ops.lowering import resolve

    return resolve().bn_lp


def _lp_normalize_eval() -> bool:
    from shift_gcn_tpu.ops.lowering import resolve

    return resolve().bn_lp_eval


def init_bn(num_features: int, scale: float = 1.0) -> Tuple[BNParams, BNState]:
    """BN params/state; scale matches reference bn_init (model/shift_gcn.py:26-28)."""
    params = {
        "weight": jnp.full((num_features,), scale, dtype=jnp.float32),
        "bias": jnp.zeros((num_features,), dtype=jnp.float32),
    }
    state = {
        "running_mean": jnp.zeros((num_features,), dtype=jnp.float32),
        "running_var": jnp.ones((num_features,), dtype=jnp.float32),
        "num_batches_tracked": jnp.zeros((), dtype=jnp.int32),
    }
    return params, state


def batch_norm(
    x: jax.Array,
    params: BNParams,
    state: BNState,
    *,
    reduce_axes: Sequence[int],
    training: bool,
    momentum: float = 0.1,
    eps: float = 1e-5,
    axis_name: Optional[str] = None,
    lp: Optional[bool] = None,
) -> Tuple[jax.Array, BNState]:
    """Normalize x over `reduce_axes`; remaining axes form the feature shape.

    `params`/`state` arrays are flat (num_features,) and are reshaped to the
    feature shape implied by x and reduce_axes.

    ``lp``: run the normalize pass in the activation dtype (see module
    header).  None resolves from the lowering config / env by phase
    (bn_lp when training, bn_lp_eval otherwise); callers holding a model
    lowering pass it explicitly.

    Returns (normalized x, new state). In eval mode state is passed through.
    """
    reduce_axes = tuple(sorted(a % x.ndim for a in reduce_axes))
    feat_shape = tuple(
        1 if a in reduce_axes else x.shape[a] for a in range(x.ndim))

    def fs(arr: jax.Array) -> jax.Array:
        return arr.reshape(feat_shape)

    # stats always accumulate in fp32 (running stats are fp32; low-precision
    # activation modes would otherwise drift), output keeps x.dtype
    x32 = x.astype(jnp.float32) if x.dtype != jnp.float32 else x
    mean, var, new_state = _batch_stats(
        x32, state, reduce_axes=reduce_axes, training=training,
        momentum=momentum, axis_name=axis_name)
    if not training:
        mean = fs(mean)
        var = fs(var)

    inv = jax.lax.rsqrt(var + eps)
    if lp is None:
        lp = _lp_normalize() if training else _lp_normalize_eval()
    if x.dtype != jnp.float32 and lp:
        # bn(x) == x*a + b with fp32-derived coefficients, evaluated in the
        # activation dtype (skips the fp32 round-trip over the big tensor)
        a = inv * fs(params["weight"])
        b = fs(params["bias"]) - mean * a
        out = x * a.astype(x.dtype) + b.astype(x.dtype)
        return out, new_state
    out = (x32 - mean) * inv * fs(params["weight"]) + fs(params["bias"])
    return out.astype(x.dtype), new_state


def _batch_stats(
    x32: jax.Array,
    state: BNState,
    *,
    reduce_axes: Sequence[int],
    training: bool,
    momentum: float,
    axis_name: Optional[str],
) -> Tuple[jax.Array, jax.Array, BNState]:
    """(mean, biased var, new state) with PyTorch running-stat semantics.

    In training mode the returned mean/var keep the reduced dims
    (keepdims=True); in eval mode the flat running stats are returned.
    """
    if training:
        mean = jnp.mean(x32, axis=reduce_axes, keepdims=True)
        mean_sq = jnp.mean(jnp.square(x32), axis=reduce_axes, keepdims=True)
        n = 1
        for a in reduce_axes:
            n *= x32.shape[a]
        if axis_name is not None:
            mean = jax.lax.pmean(mean, axis_name)
            mean_sq = jax.lax.pmean(mean_sq, axis_name)
            n = n * jax.lax.psum(1, axis_name)
        var = mean_sq - jnp.square(mean)  # biased
        unbiased = var * (n / max(n - 1, 1)) if isinstance(n, int) else (
            var * (n / (n - 1)))
        new_state = {
            "running_mean": (1 - momentum) * state["running_mean"]
            + momentum * mean.reshape(-1),
            "running_var": (1 - momentum) * state["running_var"]
            + momentum * unbiased.reshape(-1),
            "num_batches_tracked": state["num_batches_tracked"] + 1,
        }
        return mean, var, new_state
    return state["running_mean"], state["running_var"], state


def bn_affine_coeffs(
    x: jax.Array,
    params: BNParams,
    state: BNState,
    *,
    reduce_axes: Sequence[int],
    training: bool,
    momentum: float = 0.1,
    eps: float = 1e-5,
    axis_name: Optional[str] = None,
) -> Tuple[jax.Array, jax.Array, BNState]:
    """BN as per-feature affine coefficients: bn(x) == x * a + b.

    Returns fp32 flat ``(a, b, new_state)`` with a = weight/sqrt(var+eps)
    and b = bias - mean * a — identical stats/running-update semantics to
    `batch_norm`.  Lets callers fold the normalize pass into an adjacent
    matmul/conv instead of materializing bn(x).  Requires the feature
    axes of x to be exactly the non-reduced axes flattened in order.
    """
    x32 = x.astype(jnp.float32) if x.dtype != jnp.float32 else x
    reduce_axes = tuple(sorted(a % x.ndim for a in reduce_axes))
    mean, var, new_state = _batch_stats(
        x32, state, reduce_axes=reduce_axes, training=training,
        momentum=momentum, axis_name=axis_name)
    mean = mean.reshape(-1)
    var = var.reshape(-1)
    a = params["weight"] * jax.lax.rsqrt(var + eps)
    b = params["bias"] - mean * a
    return a, b, new_state
