"""Model option coverage: remat equivalence, bf16 compute path, both
temporal-shift lowerings through the full model."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from shift_gcn_tpu.models.shift_gcn import (
    BlockSpec, ModelConfig, apply, init_params)
from shift_gcn_tpu.train.optim import build_weight_decay_tree
from shift_gcn_tpu.train.state import create_train_state, make_train_step


def _cfg(**kw):
    return ModelConfig(
        num_class=2, num_point=25, num_person=1, graph="ntu_rgb_d",
        blocks=(BlockSpec(3, 8, residual=False),
                BlockSpec(8, 16, stride=2)), **kw)


def _batch(seed=0, n=4, t=16):
    rng = np.random.default_rng(seed)
    return {
        "data": jnp.asarray(
            rng.standard_normal((n, 3, t, 25, 1)), jnp.float32),
        "label": jnp.asarray(rng.integers(0, 2, n), jnp.int32),
    }


def test_remat_train_step_matches_plain():
    batch = _batch()
    lr = jnp.asarray(0.1, jnp.float32)
    outs = {}
    for remat in (False, True):
        cfg = _cfg(remat=remat)
        state = create_train_state(jax.random.key(0), cfg)
        wd = build_weight_decay_tree(state.params)
        step = jax.jit(make_train_step(cfg, wd))
        new_state, metrics = step(state, batch, lr)
        outs[remat] = (new_state, metrics)
    np.testing.assert_allclose(
        float(outs[False][1]["loss"]), float(outs[True][1]["loss"]),
        atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(outs[False][0].params),
                    jax.tree_util.tree_leaves(outs[True][0].params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_bf16_compute_trains_and_stays_close():
    batch = _batch()
    lr = jnp.asarray(0.1, jnp.float32)
    cfg32 = _cfg()
    cfg16 = _cfg(compute_dtype="bfloat16")
    state = create_train_state(jax.random.key(0), cfg32)
    wd = build_weight_decay_tree(state.params)
    _, m32 = jax.jit(make_train_step(cfg32, wd))(state, batch, lr)
    state = create_train_state(jax.random.key(0), cfg16)
    s16, m16 = jax.jit(make_train_step(cfg16, wd))(state, batch, lr)
    # params remain fp32
    assert all(l.dtype == jnp.float32 or l.dtype == jnp.int32
               for l in jax.tree_util.tree_leaves(s16.params))
    assert abs(float(m32["loss"]) - float(m16["loss"])) < 0.05


def test_bf16_activation_mode_trains_and_stays_close():
    """activation_dtype=bfloat16 runs the whole backbone in bf16 (the
    bandwidth-bound fast path); params and BN running stats stay fp32 and
    losses track the fp32 run closely over two steps."""
    batch = _batch()
    lr = jnp.asarray(0.1, jnp.float32)
    losses = {}
    for name, cfg in [("f32", _cfg()),
                      ("act16", _cfg(activation_dtype="bfloat16"))]:
        state = create_train_state(jax.random.key(0), cfg)
        wd = build_weight_decay_tree(state.params)
        step = jax.jit(make_train_step(cfg, wd))
        s, m1 = step(state, batch, lr)
        s, m2 = step(s, batch, lr)
        losses[name] = (float(m1["loss"]), float(m2["loss"]))
        for leaf in jax.tree_util.tree_leaves(s.params):
            assert leaf.dtype in (jnp.float32, jnp.int32)
        for leaf in jax.tree_util.tree_leaves(s.bn_state):
            assert leaf.dtype in (jnp.float32, jnp.int32)
        logits, _ = apply(s.params, s.bn_state, batch["data"], cfg,
                          training=False)
        assert logits.dtype == jnp.float32
    assert abs(losses["f32"][0] - losses["act16"][0]) < 0.05
    assert abs(losses["f32"][1] - losses["act16"][1]) < 0.1


@pytest.mark.slow
def test_bf16_activation_mode_converges_like_fp32():
    """Convergence parity for the production bf16-activation default: both
    dtypes learn a separable synthetic task to high train accuracy.  (The
    bench and mediapipe configs default to activation_dtype=bfloat16; this
    guards that the low-precision backbone actually trains, not just that
    one step's loss tracks.)"""
    rng = np.random.default_rng(7)
    n, t = 32, 16
    labels = rng.integers(0, 2, n)
    data = rng.standard_normal((n, 3, t, 25, 1)).astype(np.float32) * 0.1
    drift = np.linspace(0, 1, t)[:, None, None]
    for i in range(n):
        if labels[i] == 1:
            data[i, 1] += drift
    lr = jnp.asarray(0.05, jnp.float32)

    accs = {}
    for name, cfg in [("f32", _cfg()),
                      ("act16", _cfg(activation_dtype="bfloat16"))]:
        state = create_train_state(jax.random.key(1), cfg)
        wd = build_weight_decay_tree(state.params)
        step = jax.jit(make_train_step(cfg, wd))
        for epoch in range(12):
            order = np.random.default_rng(epoch).permutation(n)
            for i in range(0, n, 8):
                idx = order[i:i + 8]
                batch = {"data": jnp.asarray(data[idx]),
                         "label": jnp.asarray(labels[idx], jnp.int32)}
                state, metrics = step(state, batch, lr)
        logits, _ = apply(state.params, state.bn_state,
                          jnp.asarray(data), cfg, training=False)
        accs[name] = float(
            (np.asarray(logits).argmax(-1) == labels).mean())
    assert accs["f32"] >= 0.9, accs
    assert accs["act16"] >= 0.9, accs


def test_shift_impls_agree_through_model():
    cfg = _cfg()
    params, state = init_params(jax.random.key(1), cfg)
    x = _batch(seed=2)["data"]
    outs = {}
    for impl in ("slice", "conv", "matmul", "dft"):
        os.environ["SGT_TSHIFT_IMPL"] = impl
        # separate jit cache entries via a trivial closure difference
        f = jax.jit(lambda p, s, xx, _impl=impl: apply(
            p, s, xx, cfg, training=False)[0])
        outs[impl] = np.asarray(f(params, state, x))
    os.environ.pop("SGT_TSHIFT_IMPL", None)
    np.testing.assert_allclose(outs["slice"], outs["conv"], atol=1e-4)
    np.testing.assert_allclose(outs["matmul"], outs["conv"], atol=1e-4)
    np.testing.assert_allclose(outs["dft"], outs["conv"], atol=2e-4)


def test_pallas_spatial_with_bf16_activations_trains():
    """Regression (probe23): the fused Pallas spatial kernel under bf16
    activations tripped a grad-dtype assert (f32 cotangent for a bf16
    primal). Interpreter mode; a full train step must run and stay f32
    in the params."""
    import shift_gcn_tpu.ops.pallas.shift_gcn_kernel as pk

    batch = _batch()
    lr = jnp.asarray(0.1, jnp.float32)
    cfg = _cfg(use_pallas=True, activation_dtype="bfloat16")
    state = create_train_state(jax.random.key(0), cfg)
    wd = build_weight_decay_tree(state.params)
    step = jax.jit(make_train_step(cfg, wd))
    pk._INTERPRET = True
    try:
        s, m = step(state, batch, lr)
        assert np.isfinite(float(m["loss"]))
    finally:
        pk._INTERPRET = False
    for leaf in jax.tree_util.tree_leaves(s.params):
        assert leaf.dtype in (jnp.float32, jnp.int32)


def test_tcn_fuse_with_bf16_activations_trains(monkeypatch):
    """Regression: fused temporal shift+linear under bf16 activations must
    not hit the mixed-dtype conv-transpose rejection."""
    monkeypatch.setenv("SGT_TCN_FUSE", "1")
    batch = _batch()
    lr = jnp.asarray(0.1, jnp.float32)
    cfg = _cfg(activation_dtype="bfloat16")
    state = create_train_state(jax.random.key(0), cfg)
    wd = build_weight_decay_tree(state.params)
    step = jax.jit(make_train_step(cfg, wd))
    s, m = step(state, batch, lr)
    assert np.isfinite(float(m["loss"]))
    for leaf in jax.tree_util.tree_leaves(s.params):
        assert leaf.dtype in (jnp.float32, jnp.int32)


@pytest.mark.parametrize("env_key,env_val", [
    ("SGT_SGCN_IMPL", "chain"),      # explicit spatial chain vs default
    ("SGT_TCN_FUSE", "1"),           # fused temporal shift+linear
    ("SGT_TSHIFT_IMPL", "matmul"),   # hat-matrix MXU temporal shift
    ("SGT_TSHIFT_IMPL", "dft"),      # frequency-domain temporal shift
])
def test_fused_lowerings_match_default_train_step(monkeypatch,
                                                  env_key, env_val):
    """Whole-model equivalence: fused paths must reproduce the default
    lowering's loss AND post-step params (true grads + constraint grads)."""
    batch = _batch()
    lr = jnp.asarray(0.1, jnp.float32)
    cfg = _cfg()

    def run():
        state = create_train_state(jax.random.key(0), cfg)
        wd = build_weight_decay_tree(state.params)
        step = jax.jit(make_train_step(cfg, wd))
        new_state, metrics = step(state, batch, lr)
        return new_state, metrics

    base_state, base_metrics = run()
    monkeypatch.setenv(env_key, env_val)
    fused_state, fused_metrics = run()
    np.testing.assert_allclose(float(base_metrics["loss"]),
                               float(fused_metrics["loss"]), atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(base_state.params),
                    jax.tree_util.tree_leaves(fused_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
