"""Temporal fractional shift vs a direct numpy re-implementation of the
documented CUDA kernel semantics (shift_cuda_kernel.cu), including the
non-gradient constraint backward."""

import importlib

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from shift_gcn_tpu.ops import temporal_shift

_ts_mod = importlib.import_module("shift_gcn_tpu.ops.temporal_shift")


@pytest.fixture(autouse=True, params=[
    ("conv", False), ("conv", True),
    ("slice", True), ("roll", False), ("roll", True),
    ("matmul", False), ("matmul", True),
    ("dft", False), ("dft", True),
])
def _shift_impl(request, monkeypatch):
    """Run every oracle test under each lowering x xpos-handling mode.

    (impl, assume_xpos_zero); the oracle uses realistic |xpos| <= 1e-8 so
    both xpos modes must agree with it to fp32 tolerance."""
    impl, xz = request.param
    monkeypatch.setenv("SGT_TSHIFT_IMPL", impl)
    # xpos handling is resolved from env at trace time (ops/lowering.py)
    monkeypatch.setenv("SGT_EXACT_XPOS", "0" if xz else "1")
    yield


def _np_forward(x, xpos, ypos, stride):
    """x: (N, T, V, C). Bilinear corner sum with zero out-of-range reads."""
    n, t_in, v_in, c = x.shape
    t_out = t_in // stride
    out = np.zeros((n, t_out, v_in, c), dtype=x.dtype)
    for ch in range(c):
        xv, yv = xpos[ch], ypos[ch]
        x1 = int(np.floor(xv)); x2 = x1 + 1
        y1 = int(np.floor(yv)); y2 = y1 + 1
        dx = xv - x1; dy = yv - y1
        for t in range(t_out):
            for v in range(v_in):
                def q(ti, vi):
                    if 0 <= ti < t_in and 0 <= vi < v_in:
                        return x[:, ti, vi, ch]
                    return 0.0
                h = t * stride
                out[:, t, v, ch] = (
                    q(h + y1, v + x1) * (1 - dx) * (1 - dy)
                    + q(h + y1, v + x2) * dx * (1 - dy)
                    + q(h + y2, v + x1) * (1 - dx) * dy
                    + q(h + y2, v + x2) * dx * dy)
    return out


def _np_grad_input(g, xpos, ypos, stride, t_in):
    """Reverse shift with (-x,-y); stride-2 maps only even rows back."""
    n, t_out, v_in, c = g.shape
    out = np.zeros((n, t_in, v_in, c), dtype=g.dtype)
    for ch in range(c):
        xv, yv = -xpos[ch], -ypos[ch]
        x1 = int(np.floor(xv)); x2 = x1 + 1
        y1 = int(np.floor(yv)); y2 = y1 + 1
        dx = xv - x1; dy = yv - y1
        for h in range(t_in):
            for w in range(v_in):
                def q(ti, vi):
                    if stride == 1:
                        if 0 <= ti < t_out and 0 <= vi < v_in:
                            return g[:, ti, vi, ch]
                        return 0.0
                    # stride 2: C++ `h_im % 2 == 0` evenness then truncate-div
                    if ti % 2 != 0:
                        return 0.0
                    td = ti // 2  # even ti: floor == truncation
                    if 0 <= td < t_out and 0 <= vi < v_in:
                        return g[:, td, vi, ch]
                    return 0.0
                out[:, h, w, ch] = (
                    q(h + y1, w + x1) * (1 - dx) * (1 - dy)
                    + q(h + y1, w + x2) * dx * (1 - dy)
                    + q(h + y2, w + x1) * (1 - dx) * dy
                    + q(h + y2, w + x2) * dx * dy)
    return out


@pytest.mark.parametrize("stride", [1, 2])
def test_forward_matches_numpy(stride):
    rng = np.random.default_rng(0)
    n, t, v, c = 2, 8, 5, 6
    x = rng.standard_normal((n, t, v, c)).astype(np.float32)
    xpos = rng.uniform(-1e-8, 1e-8, c).astype(np.float32)
    ypos = rng.uniform(-1.5, 1.5, c).astype(np.float32)
    ypos_eff = ypos if stride == 1 else ypos + 0.5
    want = _np_forward(x, xpos, ypos_eff, stride)
    got = np.asarray(temporal_shift(
        jnp.asarray(x), jnp.asarray(xpos), jnp.asarray(ypos), stride))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_forward_integer_shift_is_exact_slice():
    import os

    # ypos = 1.0 exactly shifts by one frame with zero padding at the end.
    n, t, v, c = 1, 6, 3, 2
    x = np.arange(n * t * v * c, dtype=np.float32).reshape(n, t, v, c)
    ypos = np.ones(c, dtype=np.float32)
    xpos = np.zeros(c, dtype=np.float32)
    got = np.asarray(temporal_shift(
        jnp.asarray(x), jnp.asarray(xpos), jnp.asarray(ypos), 1))
    want = np.zeros_like(x)
    want[:, :-1] = x[:, 1:]
    # the frequency-domain lowering is exact math but accumulates the
    # length-L basis matmuls in fp32 (relative ~1e-6 of the spectrum's
    # magnitude, ~sum|x|); the direct lowerings hit the taps bit-exactly
    atol = 5e-4 if os.environ.get("SGT_TSHIFT_IMPL") == "dft" else 1e-6
    np.testing.assert_allclose(got, want, atol=atol)


@pytest.mark.parametrize("stride", [1, 2])
def test_grad_input_matches_numpy(stride):
    rng = np.random.default_rng(1)
    n, t, v, c = 2, 8, 4, 3
    x = rng.standard_normal((n, t, v, c)).astype(np.float32)
    xpos = rng.uniform(-1e-8, 1e-8, c).astype(np.float32)
    ypos = rng.uniform(-1.5, 1.5, c).astype(np.float32)
    g = rng.standard_normal((n, t // stride, v, c)).astype(np.float32)

    def f(xi):
        return jnp.sum(temporal_shift(
            xi, jnp.asarray(xpos), jnp.asarray(ypos), stride) * g)

    grad_x = np.asarray(jax.grad(f)(jnp.asarray(x)))
    ypos_eff = ypos if stride == 1 else ypos + 0.5
    want = _np_grad_input(g, xpos, ypos_eff, stride, t)
    np.testing.assert_allclose(grad_x, want, atol=1e-5)


def test_position_grads_follow_constraint():
    rng = np.random.default_rng(2)
    n, t, v, c = 2, 8, 4, 5
    x = rng.standard_normal((n, t, v, c)).astype(np.float32)
    xpos = rng.uniform(-1e-8, 1e-8, c).astype(np.float32)
    ypos = rng.uniform(-1.5, 1.5, c).astype(np.float32)
    g = rng.standard_normal((n, t, v, c)).astype(np.float32)

    def f(xp, yp):
        return jnp.sum(temporal_shift(jnp.asarray(x), xp, yp, 1) * g)

    gx, gy = jax.grad(f, argnums=(0, 1))(jnp.asarray(xpos), jnp.asarray(ypos))
    gx, gy = np.asarray(gx), np.asarray(gy)
    np.testing.assert_array_equal(gx, np.zeros_like(gx))
    # every |gy| is exactly 0.01 (generic data never yields exact zero raw grad)
    np.testing.assert_allclose(np.abs(gy), np.full_like(gy, 0.01), atol=1e-9)


def test_position_grad_zero_input_gives_epsilon_step():
    # All-zero input and cotangent -> raw gy == 0 -> constraint emits 1e-4.
    c = 3
    x = jnp.zeros((1, 4, 2, c))
    xpos = jnp.zeros(c)
    ypos = jnp.zeros(c)

    def f(yp):
        return jnp.sum(temporal_shift(x, xpos, yp, 1))

    gy = np.asarray(jax.grad(f)(ypos))
    np.testing.assert_allclose(gy, np.full(c, 1e-4), atol=1e-12)


def test_stride2_halves_time():
    x = jnp.ones((1, 10, 3, 2))
    out = temporal_shift(x, jnp.zeros(2), jnp.zeros(2), 2)
    assert out.shape == (1, 5, 3, 2)


@pytest.mark.slow
class TestBnShiftLinearFold:
    """bn_shift_linear == batch_norm -> temporal_shift -> pointwise_conv,
    including gradients and the constraint's boundary term."""

    def _setup(self, seed=0, n=3, t=24, v=5, c=6, d=7, training=True):
        from shift_gcn_tpu.ops.batchnorm import (batch_norm,
                                                 bn_affine_coeffs, init_bn)
        from shift_gcn_tpu.ops.conv import pointwise_conv

        ts = importlib.import_module("shift_gcn_tpu.ops.temporal_shift")
        rng = np.random.default_rng(seed)
        x = jnp.asarray(rng.standard_normal((n, t, v, c)), jnp.float32)
        bn_p, bn_s = init_bn(c)
        bn_p = {"weight": jnp.asarray(rng.uniform(0.5, 1.5, c), jnp.float32),
                "bias": jnp.asarray(rng.standard_normal(c), jnp.float32)}
        ypos = jnp.asarray(rng.uniform(-2, 2, c), jnp.float32)
        xpos = jnp.zeros((c,), jnp.float32)
        w = jnp.asarray(rng.standard_normal((c, d)) * 0.4, jnp.float32)
        bias = jnp.asarray(rng.standard_normal(d), jnp.float32)

        def unfused(x_, gamma, beta, yp, w_, b_):
            h, st = batch_norm(
                x_, {"weight": gamma, "bias": beta}, bn_s,
                reduce_axes=(0, 1, 2), training=training)
            h = ts.temporal_shift(h, xpos, yp, 1)
            wt = w_.T[:, :, None, None]  # (D, C, 1, 1) torch layout
            return pointwise_conv(h, wt, b_), st

        def fused(x_, gamma, beta, yp, w_, b_):
            a, b2, st = bn_affine_coeffs(
                x_, {"weight": gamma, "bias": beta}, bn_s,
                reduce_axes=(0, 1, 2), training=training)
            return ts.bn_shift_linear(x_, a, b2, yp, w_, b_), st

        return (x, bn_p["weight"], bn_p["bias"], ypos, w, bias,
                unfused, fused)

    @pytest.mark.parametrize("training", [True, False])
    def test_forward_matches_unfused(self, training):
        (x, gamma, beta, ypos, w, bias,
         unfused, fused) = self._setup(training=training)
        a_out, a_st = unfused(x, gamma, beta, ypos, w, bias)
        b_out, b_st = fused(x, gamma, beta, ypos, w, bias)
        np.testing.assert_allclose(np.asarray(b_out), np.asarray(a_out),
                                   rtol=2e-5, atol=2e-5)
        for k in ("running_mean", "running_var"):
            np.testing.assert_allclose(np.asarray(b_st[k]),
                                       np.asarray(a_st[k]), atol=1e-6)

    def test_gradients_match_unfused(self):
        (x, gamma, beta, ypos, w, bias,
         unfused, fused) = self._setup(seed=3)

        def make_loss(fn):
            def f(x_, gamma_, beta_, w_, b_):
                out, _ = fn(x_, gamma_, beta_, ypos, w_, b_)
                return jnp.sum(jnp.sin(out))
            return jax.grad(f, argnums=(0, 1, 2, 3, 4))

        ga = make_loss(unfused)(x, gamma, beta, w, bias)
        gb = make_loss(fused)(x, gamma, beta, w, bias)
        for u, f in zip(ga, gb):
            np.testing.assert_allclose(np.asarray(f), np.asarray(u),
                                       rtol=3e-4, atol=3e-5)

    def test_constraint_grad_matches_unfused_sign_exactly(self):
        # the ypos "grad" is a fixed-magnitude sign step; the folded op must
        # reproduce the unfused sign pattern including the affine's
        # boundary term b * dval(ones)
        for seed in range(6):
            (x, gamma, beta, ypos, w, bias,
             unfused, fused) = self._setup(seed=seed, t=12)
            # push ypos near the boundary so dval(ones) terms matter
            ypos = ypos * 3.0

            def make_gy(fn):
                def f(yp):
                    out, _ = fn(x, gamma, beta, yp, w, bias)
                    return jnp.sum(jnp.sin(out))
                return jax.grad(f)(ypos)

            gy_ref = np.asarray(make_gy(unfused))
            gy_fold = np.asarray(make_gy(fused))
            np.testing.assert_allclose(gy_fold, gy_ref, atol=1e-9,
                                       err_msg=f"seed {seed}")

    def test_model_option_matches_default(self, monkeypatch):
        from shift_gcn_tpu.models.shift_gcn import (ModelConfig, apply,
                                                    init_params)

        cfg = ModelConfig(num_class=2, num_point=25, num_person=1,
                          graph="ntu_rgb_d")
        params, state = init_params(jax.random.key(0), cfg)
        rng = np.random.default_rng(0)
        xb = jnp.asarray(rng.standard_normal((2, 3, 64, 25, 1)), jnp.float32)
        monkeypatch.setenv("SGT_TCN_BNFOLD", "0")
        ref, _ = apply(params, state, xb, cfg, training=True)
        monkeypatch.setenv("SGT_TCN_BNFOLD", "1")
        got, _ = apply(params, state, xb, cfg, training=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)


class TestFreqFusedShiftLinear:
    """temporal_shift_linear_dft == temporal_shift(dft) -> pointwise, for
    the forward, all true grads (x/w/bias), and the constraint ypos step
    (whose raw sign is taken at the shift-output cotangent g @ W^T)."""

    def _setup(self, seed=0, n=3, t=24, v=5, c=6, d=7):
        rng = np.random.default_rng(seed)
        x = jnp.asarray(rng.standard_normal((n, t, v, c)), jnp.float32)
        ypos = jnp.asarray(rng.uniform(-3, 3, c), jnp.float32)
        xpos = jnp.zeros((c,), jnp.float32)
        w = jnp.asarray(rng.standard_normal((c, d)) * 0.4, jnp.float32)
        bias = jnp.asarray(rng.standard_normal(d), jnp.float32)
        return x, xpos, ypos, w, bias

    def _unfused(self, x, xpos, ypos, w, bias, monkeypatch):
        from shift_gcn_tpu.ops.conv import pointwise_conv

        ts = importlib.import_module("shift_gcn_tpu.ops.temporal_shift")
        monkeypatch.setenv("SGT_TSHIFT_IMPL", "dft")
        monkeypatch.setenv("SGT_EXACT_XPOS", "0")
        h = ts.temporal_shift(x, xpos, ypos, 1)
        wt = w.T[:, :, None, None]  # (D, C, 1, 1) torch layout
        return pointwise_conv(h, wt, bias)

    def test_forward_matches_composition(self, monkeypatch):
        ts = importlib.import_module("shift_gcn_tpu.ops.temporal_shift")
        x, xpos, ypos, w, bias = self._setup()
        want = self._unfused(x, xpos, ypos, w, bias, monkeypatch)
        got = ts.temporal_shift_linear_dft(x, xpos, ypos, w, bias)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    def test_true_grads_match_composition(self, monkeypatch):
        ts = importlib.import_module("shift_gcn_tpu.ops.temporal_shift")
        x, xpos, ypos, w, bias = self._setup(seed=4)

        def loss_fused(x_, w_, b_):
            return jnp.sum(jnp.sin(
                ts.temporal_shift_linear_dft(x_, xpos, ypos, w_, b_)))

        def loss_unfused(x_, w_, b_):
            return jnp.sum(jnp.sin(
                self._unfused(x_, xpos, ypos, w_, b_, monkeypatch)))

        ga = jax.grad(loss_unfused, argnums=(0, 1, 2))(x, w, bias)
        gb = jax.grad(loss_fused, argnums=(0, 1, 2))(x, w, bias)
        for u, f, name in zip(ga, gb, ("x", "w", "bias")):
            np.testing.assert_allclose(
                np.asarray(f), np.asarray(u), rtol=3e-4, atol=3e-5,
                err_msg=name)

    def test_constraint_ypos_matches_composition(self, monkeypatch):
        ts = importlib.import_module("shift_gcn_tpu.ops.temporal_shift")
        for seed in range(6):
            x, xpos, ypos, w, bias = self._setup(seed=seed, t=16)

            gy_ref = np.asarray(jax.grad(lambda yp: jnp.sum(jnp.sin(
                self._unfused(x, xpos, yp, w, bias, monkeypatch))))(ypos))
            gy_fused = np.asarray(jax.grad(lambda yp: jnp.sum(jnp.sin(
                ts.temporal_shift_linear_dft(x, xpos, yp, w, bias))))(ypos))
            np.testing.assert_allclose(gy_fused, gy_ref, atol=1e-9,
                                       err_msg=f"seed {seed}")
            mags = np.abs(gy_fused)
            assert np.all(np.isclose(mags, 0.01, atol=1e-8)
                          | np.isclose(mags, 0.0001, atol=1e-8))

    @pytest.mark.parametrize("training", [True, False])
    def test_model_option_matches_default(self, monkeypatch, training):
        from shift_gcn_tpu.models.shift_gcn import (ModelConfig, apply,
                                                    init_params)

        ts = importlib.import_module("shift_gcn_tpu.ops.temporal_shift")
        monkeypatch.setenv("SGT_TSHIFT_IMPL", "dft")
        monkeypatch.setenv("SGT_EXACT_XPOS", "0")
        cfg = ModelConfig(num_class=2, num_point=25, num_person=1,
                          graph="ntu_rgb_d")
        params, state = init_params(jax.random.key(0), cfg)
        rng = np.random.default_rng(0)
        xb = jnp.asarray(rng.standard_normal((2, 3, 64, 25, 1)), jnp.float32)
        monkeypatch.setenv("SGT_TCN_FREQ_FUSE", "0")
        ref, _ = apply(params, state, xb, cfg, training=training)
        monkeypatch.setenv("SGT_TCN_FREQ_FUSE", "1")
        got, _ = apply(params, state, xb, cfg, training=training)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)
