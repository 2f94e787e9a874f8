"""Shift-GCN model family — functional JAX, channels-last, torch-shaped params.

Design: the model is a pure function over an explicit parameter pytree whose
structure mirrors the reference torch ``state_dict`` (reference:
model/shift_gcn.py:165-216) so converted checkpoints load directly.  BN
running stats live in a parallel ``state`` pytree; ``apply`` returns
``(logits, new_state)``.

Backbone (reference: model/shift_gcn.py:178-187): 10 TCN_GCN_units,
3->64 (no residual), 3x 64->64, 64->128 stride2, 2x 128->128,
128->256 stride2, 2x 256->256, global mean over (T', V) then persons,
linear classifier.

Layout: input (N, C, T, V, M) like the reference feeder; internally
(N*M, T, V, C) channels-last (TPU-friendly: the hot matmuls contract over
the trailing channel axis on the MXU).
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from shift_gcn_tpu.graphs import get_graph
from shift_gcn_tpu.ops.batchnorm import batch_norm, init_bn
from shift_gcn_tpu.ops.conv import pointwise_conv, temporal_conv
from shift_gcn_tpu.ops.lowering import Lowering
from shift_gcn_tpu.ops.lowering import resolve as resolve_lowering
from shift_gcn_tpu.ops.spatial_shift import shift_gcn_transform
from shift_gcn_tpu.ops.temporal_shift import (
    temporal_shift, temporal_shift_linear)

Params = Dict[str, Any]
State = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class BlockSpec:
    in_channels: int
    out_channels: int
    stride: int = 1
    residual: bool = True


def default_backbone() -> Tuple[BlockSpec, ...]:
    """The 10-block Shift-GCN backbone (reference: model/shift_gcn.py:178-187)."""
    return (
        BlockSpec(3, 64, residual=False),
        BlockSpec(64, 64),
        BlockSpec(64, 64),
        BlockSpec(64, 64),
        BlockSpec(64, 128, stride=2),
        BlockSpec(128, 128),
        BlockSpec(128, 128),
        BlockSpec(128, 256, stride=2),
        BlockSpec(256, 256),
        BlockSpec(256, 256),
    )


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Model hyperparameters (reference Model.__init__ signature,
    model/shift_gcn.py:166)."""

    num_class: int = 60
    num_point: int = 25
    num_person: int = 2
    graph: str = "ntu_rgb_d"
    in_channels: int = 3
    blocks: Tuple[BlockSpec, ...] = dataclasses.field(
        default_factory=default_backbone)
    shift_init_scale: float = 1.0
    compute_dtype: Optional[str] = None  # e.g. "bfloat16" for matmul inputs
    # run the whole backbone in this activation dtype (params, BN stats,
    # and the final pooling/classifier stay fp32).  The model is
    # HBM-bandwidth-bound, so "bfloat16" halves activation traffic —
    # unlike compute_dtype, which only casts matmul inputs.
    activation_dtype: Optional[str] = None
    # rematerialize each block in the backward pass (jax.checkpoint):
    # trades ~30% more FLOPs for O(depth) less HBM for activations —
    # enables larger batches than the reference's fp32-everything layout
    remat: bool = False
    # use the fused Pallas kernel for the spatial shift-gcn transform
    # (single HBM pass for shift->gate->matmul->shift)
    use_pallas: bool = False
    # lowering / fusion selection (ops/lowering.py) — which temporal-shift
    # and spatial-transform lowerings, fusion passes, BN precision, and
    # tap radius this model compiles with.  Part of the (hashable) config,
    # so it is a static piece of every jit cache key that closes over the
    # config: two models with different lowerings coexist in one process.
    # None = resolve from the SGT_* env overrides / defaults at trace
    # time; a set env var also overrides an explicit value here (probe
    # escape hatch — precedence: env > config > default).
    lowering: Optional[Lowering] = None

    @property
    def dtype(self) -> Optional[jnp.dtype]:
        return jnp.dtype(self.compute_dtype) if self.compute_dtype else None

    @property
    def act_dtype(self) -> Optional[jnp.dtype]:
        return (jnp.dtype(self.activation_dtype)
                if self.activation_dtype else None)


# ---------------------------------------------------------------------------
# Initialization (distribution parity with the reference)
# ---------------------------------------------------------------------------


def _kaiming_normal_fan_out(key, shape) -> jax.Array:
    """torch kaiming_normal_(mode='fan_out') for OIHW conv weight:
    std = sqrt(2 / (C_out * kh * kw))."""
    fan_out = shape[0] * int(np.prod(shape[2:])) if len(shape) > 2 else shape[0]
    std = math.sqrt(2.0 / fan_out)
    return jax.random.normal(key, shape, dtype=jnp.float32) * std


def _torch_conv_bias(key, fan_in, shape) -> jax.Array:
    """torch default conv/linear bias: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(
        key, shape, minval=-bound, maxval=bound, dtype=jnp.float32)


def _init_shift(key, channels: int, init_scale: float):
    """Shift op positions (reference: shift.py:39-43)."""
    kx, ky = jax.random.split(key)
    return {
        "xpos": jax.random.uniform(
            kx, (channels,), minval=-1e-8, maxval=1e-8, dtype=jnp.float32),
        "ypos": jax.random.uniform(
            ky, (channels,), minval=-init_scale, maxval=init_scale,
            dtype=jnp.float32),
    }


def _init_shift_gcn(key, cin: int, cout: int, v: int):
    """Spatial block params (reference: model/shift_gcn.py:77-118)."""
    keys = jax.random.split(key, 4)
    params: Params = {
        "Linear_weight": jax.random.normal(
            keys[0], (cin, cout), dtype=jnp.float32)
        * math.sqrt(1.0 / cout),
        "Linear_bias": jnp.zeros((1, 1, cout), dtype=jnp.float32),
        "Feature_Mask": jnp.zeros((1, v, cin), dtype=jnp.float32),
    }
    bn_p, bn_s = init_bn(v * cout)
    params["bn"] = bn_p
    state: State = {"bn": bn_s}
    if cin != cout:
        down_conv_w = _kaiming_normal_fan_out(keys[1], (cout, cin, 1, 1))
        down_bn_p, down_bn_s = init_bn(cout)
        params["down"] = {
            "conv": {"weight": down_conv_w,
                     "bias": jnp.zeros((cout,), dtype=jnp.float32)},
            "bn": down_bn_p,
        }
        state["down"] = {"bn": down_bn_s}
    return params, state


def _init_shift_tcn(key, cin: int, cout: int, init_scale: float):
    """Temporal block params (reference: model/shift_gcn.py:48-63)."""
    keys = jax.random.split(key, 4)
    bn_p, bn_s = init_bn(cin)
    bn2_p, bn2_s = init_bn(cout)
    params: Params = {
        "bn": bn_p,
        "bn2": bn2_p,
        "shift_in": _init_shift(keys[0], cin, init_scale),
        "shift_out": _init_shift(keys[1], cout, init_scale),
        "temporal_linear": {
            "weight": _kaiming_normal_fan_out(keys[2], (cout, cin, 1, 1)),
            # temporal_linear bias keeps the torch default init (only the
            # weight is kaiming'd at model/shift_gcn.py:63)
            "bias": _torch_conv_bias(keys[3], cin, (cout,)),
        },
    }
    state: State = {"bn": bn_s, "bn2": bn2_s}
    return params, state


def _init_residual_tcn(key, cin: int, cout: int):
    """k=1 strided conv + BN residual (reference: model/shift_gcn.py:31-45, 158)."""
    kw, = jax.random.split(key, 1)
    bn_p, bn_s = init_bn(cout)
    params = {
        "conv": {
            "weight": _kaiming_normal_fan_out(kw, (cout, cin, 1, 1)),
            "bias": jnp.zeros((cout,), dtype=jnp.float32),
        },
        "bn": bn_p,
    }
    return params, {"bn": bn_s}


def init_params(
    key: jax.Array, config: ModelConfig
) -> Tuple[Params, State]:
    """Build the full parameter/state pytrees with reference-parity init."""
    v = config.num_point
    keys = jax.random.split(key, len(config.blocks) + 3)
    data_bn_p, data_bn_s = init_bn(
        config.num_person * config.in_channels * v)
    params: Params = {"data_bn": data_bn_p}
    state: State = {"data_bn": data_bn_s}

    for i, spec in enumerate(config.blocks):
        bkey = jax.random.split(keys[i], 3)
        gcn_p, gcn_s = _init_shift_gcn(
            bkey[0], spec.in_channels, spec.out_channels, v)
        tcn_p, tcn_s = _init_shift_tcn(
            bkey[1], spec.out_channels, spec.out_channels,
            config.shift_init_scale)
        block_p: Params = {"gcn1": gcn_p, "tcn1": tcn_p}
        block_s: State = {"gcn1": gcn_s, "tcn1": tcn_s}
        if spec.residual and (
                spec.in_channels != spec.out_channels or spec.stride != 1):
            res_p, res_s = _init_residual_tcn(
                bkey[2], spec.in_channels, spec.out_channels)
            block_p["residual"] = res_p
            block_s["residual"] = res_s
        params[f"l{i + 1}"] = block_p
        state[f"l{i + 1}"] = block_s

    fc_key, fcb_key = jax.random.split(keys[-1])
    feat = config.blocks[-1].out_channels
    params["fc"] = {
        # reference: nn.init.normal_(fc.weight, 0, sqrt(2/num_class)),
        # torch Linear weight is (out, in)
        "weight": jax.random.normal(
            fc_key, (config.num_class, feat), dtype=jnp.float32)
        * math.sqrt(2.0 / config.num_class),
        "bias": _torch_conv_bias(fcb_key, feat, (config.num_class,)),
    }
    return params, state


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _apply_shift_gcn(
    params: Params,
    state: State,
    x: jax.Array,
    *,
    training: bool,
    axis_name: Optional[str],
    compute_dtype,
    use_pallas: bool = False,
    low: Optional[Lowering] = None,
) -> Tuple[jax.Array, State]:
    """Spatial block (reference: model/shift_gcn.py:121-142).

    x: (N, T, V, C_in) -> (N, T, V, C_out).
    """
    if low is None:  # direct callers; apply() passes the resolved value
        low = resolve_lowering(None)
    lp = low.bn_lp if training else low.bn_lp_eval
    n, t, v, cin = x.shape
    if use_pallas:
        from shift_gcn_tpu.ops.pallas.shift_gcn_kernel import fused_shift_gcn

        gate = jnp.tanh(params["Feature_Mask"][0]) + 1.0
        h = fused_shift_gcn(
            x.reshape(n * t, v, cin), gate, params["Linear_weight"],
            params["Linear_bias"].reshape(-1))
        h = h.reshape(n, t, v, -1)
    else:
        h = shift_gcn_transform(
            x,
            params["Linear_weight"],
            params["Linear_bias"],
            params["Feature_Mask"],
            compute_dtype=compute_dtype,
            impl=low.sgcn_impl,
            sshift_impl=low.sshift_impl,
        )
    # BatchNorm1d over (V*C_out) features with stats over N*T — computed in
    # 4D with a (V, C) feature shape (identical math; avoids the trailing
    # (V,C)->(V*C) relayout, which is both an extra pass for XLA and a
    # Mosaic compile-crash trigger right after the Pallas kernel)
    cout = h.shape[-1]
    h, bn_state = batch_norm(
        h, params["bn"], state["bn"], reduce_axes=(0, 1),
        training=training, axis_name=axis_name, lp=lp)

    new_state: State = {"bn": bn_state}
    if "down" in params:
        res = pointwise_conv(
            x, params["down"]["conv"]["weight"], params["down"]["conv"]["bias"],
            compute_dtype=compute_dtype)
        res, down_bn_state = batch_norm(
            res, params["down"]["bn"], state["down"]["bn"],
            reduce_axes=(0, 1, 2), training=training, axis_name=axis_name,
            lp=lp)
        new_state["down"] = {"bn": down_bn_state}
    else:
        res = x
    return jax.nn.relu(h + res), new_state


def _apply_shift_tcn(
    params: Params,
    state: State,
    x: jax.Array,
    *,
    stride: int,
    training: bool,
    axis_name: Optional[str],
    compute_dtype,
    time_axis: Optional[str] = None,
    batch_axes: Tuple[str, ...] = (),
    low: Optional[Lowering] = None,
) -> Tuple[jax.Array, State]:
    """Temporal block (reference: model/shift_gcn.py:65-74).

    x: (N, T, V, C) -> (N, T//stride, V, C_out).

    With ``time_axis`` set (T sharded over that mesh axis inside a
    shard_map), the temporal shifts run as halo-exchange ops
    (parallel/halo.py) with the same constraint VJP.

    ``low`` selects the lowering/fusion paths (ops/lowering.py); None
    resolves from the SGT_* env overrides / defaults.
    """
    import importlib

    if low is None:  # direct callers; apply() passes the resolved value
        low = resolve_lowering(None)
    lp = low.bn_lp if training else low.bn_lp_eval

    if time_axis is not None:
        from shift_gcn_tpu.parallel.halo import sharded_temporal_shift_train

        h, bn_state = batch_norm(
            x, params["bn"], state["bn"], reduce_axes=(0, 1, 2),
            training=training, axis_name=axis_name, lp=lp)
        h = sharded_temporal_shift_train(
            h, params["shift_in"]["xpos"], params["shift_in"]["ypos"], 1,
            time_axis, batch_axes, low.max_shift)
        h = pointwise_conv(
            h, params["temporal_linear"]["weight"],
            params["temporal_linear"]["bias"],
            compute_dtype=compute_dtype)
        h = jax.nn.relu(h)
        h = sharded_temporal_shift_train(
            h, params["shift_out"]["xpos"], params["shift_out"]["ypos"],
            stride, time_axis, batch_axes, low.max_shift)
        h, bn2_state = batch_norm(
            h, params["bn2"], state["bn2"], reduce_axes=(0, 1, 2),
            training=training, axis_name=axis_name, lp=lp)
        return h, {"bn": bn_state, "bn2": bn2_state}
    # NB: must be importlib — `shift_gcn_tpu.ops` re-exports the
    # `temporal_shift` *function*, shadowing the submodule name
    _ts_mod = importlib.import_module("shift_gcn_tpu.ops.temporal_shift")

    # tshift_impl="pallas" swaps in the VMEM 2-tap kernel (same
    # semantics + constraint VJP; requires the xpos-zero lowering)
    if low.tshift_impl == "pallas" and low.xpos_zero:
        from shift_gcn_tpu.ops.pallas.temporal_shift_kernel import (
            temporal_shift_pallas)

        # radius pinned from the per-model lowering, not process state
        _tshift = functools.partial(temporal_shift_pallas,
                                    max_shift=low.max_shift)
    else:
        _tshift = functools.partial(temporal_shift, low=low)

    if (low.tcn_bnfold
            and low.xpos_zero
            and low.tshift_impl == "conv"
            and not low.tcn_fuse):
        # fold the BN affine through the per-channel shift into the 1x1
        # weights (ops/temporal_shift.bn_shift_linear): no normalize pass
        from shift_gcn_tpu.ops.batchnorm import bn_affine_coeffs

        a_bn, b_bn, bn_state = bn_affine_coeffs(
            x, params["bn"], state["bn"], reduce_axes=(0, 1, 2),
            training=training, axis_name=axis_name)
        w2 = params["temporal_linear"]["weight"][:, :, 0, 0].T  # (C, D)
        h = _ts_mod.bn_shift_linear(
            x, a_bn, b_bn, params["shift_in"]["ypos"], w2,
            params["temporal_linear"]["bias"], low)
        h = jax.nn.relu(h)
        h = _tshift(
            h, params["shift_out"]["xpos"], params["shift_out"]["ypos"],
            stride)
        h, bn2_state = batch_norm(
            h, params["bn2"], state["bn2"], reduce_axes=(0, 1, 2),
            training=training, axis_name=axis_name, lp=lp)
        return h, {"bn": bn_state, "bn2": bn2_state}

    h, bn_state = batch_norm(
        x, params["bn"], state["bn"], reduce_axes=(0, 1, 2),
        training=training, axis_name=axis_name, lp=lp)
    if low.tcn_fuse and low.xpos_zero:
        # fused shift_in + temporal_linear: one MXU conv
        w2 = params["temporal_linear"]["weight"][:, :, 0, 0].T
        h = temporal_shift_linear(
            h, params["shift_in"]["xpos"], params["shift_in"]["ypos"],
            w2, params["temporal_linear"]["bias"], low)
    elif (str(low.tcn_freq_fuse)
            in (("1", "eval") if not training else ("1",))
            and low.xpos_zero
            and low.tshift_impl == "dft"
            and compute_dtype is None):
        # compute_dtype (matmul-input-only casting) is honored by the
        # unfused pointwise_conv but not by the fused frequency pass
        # (which runs uniformly in the activation dtype, like the other
        # dft lowerings) — fall back to the composition so that mode's
        # contract holds.  Production low precision is activation_dtype,
        # where the fused pass is already bf16 end to end.
        # shift_in + temporal_linear in one shared Fourier-basis pass
        # (ops/temporal_shift.temporal_shift_linear_dft): one fewer
        # matmul + one fewer (N,T,V,C) materialization per block.
        # tcn_freq_fuse: "eval" (default — fused in eval only, where
        # it measures +3.5% with zero overlap, probe37; train is a wash
        # because the backward's extra grad_W einsums offset the saving,
        # probe36), "1" (always), "0" (never).
        w2 = params["temporal_linear"]["weight"][:, :, 0, 0].T
        h = _ts_mod.temporal_shift_linear_dft(
            h, params["shift_in"]["xpos"], params["shift_in"]["ypos"],
            w2, params["temporal_linear"]["bias"], low)
    else:
        h = _tshift(
            h, params["shift_in"]["xpos"], params["shift_in"]["ypos"], 1)
        h = pointwise_conv(
            h, params["temporal_linear"]["weight"],
            params["temporal_linear"]["bias"],
            compute_dtype=compute_dtype)
    h = jax.nn.relu(h)
    h = _tshift(
        h, params["shift_out"]["xpos"], params["shift_out"]["ypos"], stride)
    h, bn2_state = batch_norm(
        h, params["bn2"], state["bn2"], reduce_axes=(0, 1, 2),
        training=training, axis_name=axis_name, lp=lp)
    return h, {"bn": bn_state, "bn2": bn2_state}


def _apply_block(
    params: Params,
    state: State,
    x: jax.Array,
    spec: BlockSpec,
    *,
    training: bool,
    axis_name: Optional[str],
    compute_dtype,
    use_pallas: bool = False,
    time_axis: Optional[str] = None,
    batch_axes: Tuple[str, ...] = (),
    low: Optional[Lowering] = None,
) -> Tuple[jax.Array, State]:
    """TCN_GCN_unit (reference: model/shift_gcn.py:145-162)."""
    h, gcn_state = _apply_shift_gcn(
        params["gcn1"], state["gcn1"], x, training=training,
        axis_name=axis_name, compute_dtype=compute_dtype,
        use_pallas=use_pallas, low=low)
    h, tcn_state = _apply_shift_tcn(
        params["tcn1"], state["tcn1"], h, stride=spec.stride,
        training=training, axis_name=axis_name, compute_dtype=compute_dtype,
        time_axis=time_axis, batch_axes=batch_axes, low=low)
    new_state: State = {"gcn1": gcn_state, "tcn1": tcn_state}
    if not spec.residual:
        res = 0.0
    elif "residual" in params:
        if time_axis is not None and params["residual"]["conv"][
                "weight"].shape[2] != 1:
            raise ValueError(
                "time-sharded apply supports only k=1 residual convs "
                "(k>1 would need its own halo exchange)")
        low_r = low if low is not None else resolve_lowering(None)
        res = temporal_conv(
            x, params["residual"]["conv"]["weight"],
            params["residual"]["conv"]["bias"], stride=spec.stride,
            compute_dtype=compute_dtype)
        res, res_bn_state = batch_norm(
            res, params["residual"]["bn"], state["residual"]["bn"],
            reduce_axes=(0, 1, 2), training=training, axis_name=axis_name,
            lp=low_r.bn_lp if training else low_r.bn_lp_eval)
        res = res.astype(h.dtype)  # residual conv runs fp32; rejoin in the
        new_state["residual"] = {"bn": res_bn_state}  # activation dtype
    else:
        res = x
    return jax.nn.relu(h + res), new_state


def apply(
    params: Params,
    state: State,
    x: jax.Array,
    config: ModelConfig,
    *,
    training: bool = False,
    axis_name: Optional[str] = None,
    time_axis: Optional[str] = None,
) -> Tuple[jax.Array, State]:
    """Full model forward.

    Args:
      x: (N, C, T, V, M) float input — reference feeder layout.
      training: batch-stat BN + running-stat update when True.
      axis_name: mesh axis (or tuple of axes) for sync-BN (None =
        per-replica stats, the reference-parity behavior under data
        parallelism).  When time_axis is set this MUST include it so BN
        stats cover the full (N, T) extent.
      time_axis: mesh axis holding a shard of T (sequence parallelism;
        call inside `jax.shard_map` with x sharded on T).  Temporal shifts
        become halo-exchange ops and the final pooling pmean-reduces over
        the axis, so the returned logits are replicated along it.

    Returns:
      (logits (N, num_class), new_state).
    """
    n, c, t, v, m = x.shape
    compute_dtype = config.dtype
    # resolve the lowering ONCE per trace (env > config > default) and
    # thread it down — no ambient reads below this point
    low = resolve_lowering(config.lowering)
    if time_axis is not None:
        bn_axes = ((axis_name,) if isinstance(axis_name, str)
                   else tuple(axis_name or ()))
        if training and time_axis not in bn_axes:
            raise ValueError(
                "axis_name must include time_axis for correct BN stats")
        batch_axes = tuple(a for a in bn_axes if a != time_axis)
    else:
        batch_axes = ()

    # data_bn over M*V*C features with stats over (N, T)
    # (reference: model/shift_gcn.py:196-198).
    h = jnp.transpose(x, (0, 4, 3, 1, 2))          # (N, M, V, C, T)
    h = h.reshape(n, m * v * c, t)
    h = jnp.transpose(h, (0, 2, 1))                # (N, T, M*V*C)
    h, data_bn_state = batch_norm(
        h, params["data_bn"], state["data_bn"], reduce_axes=(0, 1),
        training=training, axis_name=axis_name,
        lp=low.bn_lp if training else low.bn_lp_eval)
    h = h.reshape(n, t, m, v, c)
    h = jnp.transpose(h, (0, 2, 1, 3, 4)).reshape(n * m, t, v, c)
    if config.act_dtype is not None:
        h = h.astype(config.act_dtype)

    new_state: State = {"data_bn": data_bn_state}
    use_remat = config.remat and training

    def run_block(p, s, x, spec):
        fn = lambda p_, s_, x_: _apply_block(  # noqa: E731
            p_, s_, x_, spec, training=training,
            axis_name=axis_name, compute_dtype=compute_dtype,
            use_pallas=config.use_pallas, time_axis=time_axis,
            batch_axes=batch_axes, low=low)
        if use_remat:
            fn = jax.checkpoint(fn)
        return fn(p, s, x)

    for i, spec in enumerate(config.blocks):
        name = f"l{i + 1}"
        h, block_state = run_block(params[name], state[name], h, spec)
        new_state[name] = block_state

    # global average over (T', V) then persons (reference: shift_gcn.py:212-214)
    # — pooled and classified in fp32 regardless of activation dtype
    feat = h.shape[-1]
    h = h.astype(jnp.float32)
    h = h.reshape(n, m, -1, feat).mean(axis=2).mean(axis=1)  # (N, feat)
    if time_axis is not None:
        # equal T' shards: global mean over (T', V) = mean of shard means
        h = jax.lax.pmean(h, time_axis)
    logits = h @ params["fc"]["weight"].T + params["fc"]["bias"]
    return logits, new_state


def make_model(config: ModelConfig):
    """Convenience bundle: (init_fn, apply_fn) closed over the config."""

    def init_fn(key):
        return init_params(key, config)

    def apply_fn(params, state, x, *, training=False, axis_name=None):
        return apply(params, state, x, config,
                     training=training, axis_name=axis_name)

    return init_fn, apply_fn


def param_count(params: Params) -> int:
    return sum(int(np.prod(p.shape))
               for p in jax.tree_util.tree_leaves(params))


def config_from_reference_args(model_args: Dict[str, Any]) -> ModelConfig:
    """Build a ModelConfig from reference-style YAML ``model_args``
    (num_class/num_point/num_person/graph/graph_args/in_channels), plus the
    TPU-native extension ``blocks``: a list of
    [in_channels, out_channels, stride, residual] rows overriding the
    default 10-block backbone."""
    graph_name = model_args.get("graph", "ntu_rgb_d")
    graph = get_graph(graph_name)
    kwargs: Dict[str, Any] = {}
    if "lowering" in model_args:
        from shift_gcn_tpu.ops.lowering import from_dict

        kwargs["lowering"] = from_dict(model_args["lowering"])
    if "blocks" in model_args:
        kwargs["blocks"] = tuple(
            BlockSpec(int(b[0]), int(b[1]),
                      stride=int(b[2]) if len(b) > 2 else 1,
                      residual=bool(b[3]) if len(b) > 3 else True)
            for b in model_args["blocks"])
    return ModelConfig(
        num_class=model_args.get("num_class", 60),
        num_point=model_args.get("num_point", graph.num_nodes),
        num_person=model_args.get("num_person", 2),
        graph=graph.name,
        in_channels=model_args.get("in_channels", 3),
        **kwargs,
    )
