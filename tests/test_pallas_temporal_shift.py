"""Pallas temporal-shift kernel vs the XLA lowering (interpret mode)."""

import importlib

import numpy as np
import pytest

import jax
import jax.numpy as jnp

ts = importlib.import_module("shift_gcn_tpu.ops.temporal_shift")
pk = importlib.import_module(
    "shift_gcn_tpu.ops.pallas.temporal_shift_kernel")


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(pk, "_INTERPRET", True)
    monkeypatch.setenv("SGT_EXACT_XPOS", "0")  # xpos-zero lowering
    yield


@pytest.mark.parametrize("stride", [1, 2])
@pytest.mark.parametrize("t,v,c", [(32, 7, 5), (40, 3, 17)])
def test_forward_matches_xla_lowering(stride, t, v, c):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, t, v, c)), jnp.float32)
    xpos = jnp.zeros(c)
    ypos = jnp.asarray(rng.uniform(-3, 3, c), jnp.float32)
    want = np.asarray(ts.temporal_shift(x, xpos, ypos, stride))
    got = np.asarray(pk.temporal_shift_pallas(x, xpos, ypos, stride))
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("stride", [1, 2])
def test_grads_match_xla_lowering(stride):
    rng = np.random.default_rng(1)
    t, v, c = 32, 5, 6
    x = jnp.asarray(rng.standard_normal((2, t, v, c)), jnp.float32)
    xpos = jnp.zeros(c)
    ypos = jnp.asarray(rng.uniform(-2, 2, c), jnp.float32)
    g = jnp.asarray(
        rng.standard_normal((2, t // stride, v, c)), jnp.float32)

    def grads(fn):
        def f(xx, yp):
            return jnp.sum(fn(xx, xpos, yp, stride) * g)
        return jax.grad(f, argnums=(0, 1))(x, ypos)

    (gx1, gy1) = grads(ts.temporal_shift)
    (gx2, gy2) = grads(pk.temporal_shift_pallas)
    np.testing.assert_allclose(np.asarray(gx2), np.asarray(gx1), atol=1e-5)
    # constraint grads are exactly ±0.01 / 1e-4 — must match bit-for-bit
    np.testing.assert_array_equal(np.asarray(gy2), np.asarray(gy1))


def test_integer_shift_is_exact(monkeypatch):
    # compare against the exact tap-conv lowering: the default dft path is
    # allclose-but-not-bit-exact on integer shifts (frequency-domain
    # round-trip), while conv and the Pallas kernel are exact
    monkeypatch.setenv("SGT_TSHIFT_IMPL", "conv")
    x = jnp.asarray(
        np.arange(2 * 12 * 3 * 2, dtype=np.float32).reshape(2, 12, 3, 2))
    ypos = jnp.asarray([1.0, -2.0])
    a = np.asarray(ts.temporal_shift(x, jnp.zeros(2), ypos, 1))
    b = np.asarray(pk.temporal_shift_pallas(x, jnp.zeros(2), ypos, 1))
    np.testing.assert_array_equal(a, b)
    # and both equal the analytic integer shift (zero padding at the ends)
    want = np.zeros_like(np.asarray(x))
    want[:, :-1, :, 0] = np.asarray(x)[:, 1:, :, 0]    # ypos=+1
    want[:, 2:, :, 1] = np.asarray(x)[:, :-2, :, 1]    # ypos=-2
    np.testing.assert_array_equal(b, want)


def test_channel_padding_path():
    # C not a multiple of the block size exercises the pad/strip logic
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 24, 4, 3)), jnp.float32)
    ypos = jnp.asarray(rng.uniform(-1, 1, 3), jnp.float32)
    want = np.asarray(ts.temporal_shift(x, jnp.zeros(3), ypos, 1))
    got = np.asarray(pk.temporal_shift_pallas(x, jnp.zeros(3), ypos, 1))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_two_radii_one_process():
    """The kernel's tap span is a per-call static argument threaded from
    lowering.max_shift, not process state: radius-4 and radius-8 calls
    run in one process and agree (any radius >= |ypos| is exact)."""
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((1, 24, 3, 4)), jnp.float32)
    ypos = jnp.asarray(rng.uniform(-3, 3, 4), jnp.float32)
    want = np.asarray(ts.temporal_shift(x, jnp.zeros(4), ypos, 1))
    r4 = np.asarray(pk.temporal_shift_pallas(
        x, jnp.zeros(4), ypos, 1, max_shift=4))
    r8 = np.asarray(pk.temporal_shift_pallas(
        x, jnp.zeros(4), ypos, 1, max_shift=8))
    np.testing.assert_allclose(r4, want, atol=1e-5)
    np.testing.assert_array_equal(r4, r8)


def test_model_dispatch_matches_default(monkeypatch):
    """SGT_TSHIFT_IMPL=pallas routes the model's temporal shifts through
    the kernel; eval forward must match the default lowering."""
    from shift_gcn_tpu.models.shift_gcn import (
        BlockSpec, ModelConfig, apply, init_params)

    cfg = ModelConfig(
        num_class=2, num_point=25, num_person=1, graph="ntu_rgb_d",
        blocks=(BlockSpec(3, 8, residual=False),
                BlockSpec(8, 16, stride=2)))
    params, state = init_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 3, 64, 25, 1)), jnp.float32)

    want = np.asarray(apply(params, state, x, cfg, training=False)[0])
    monkeypatch.setenv("SGT_TSHIFT_IMPL", "pallas")
    got = np.asarray(apply(params, state, x, cfg, training=False)[0])
    np.testing.assert_allclose(got, want, atol=1e-4)
