"""Fused Pallas spatial Shift-GCN kernel vs the XLA reference op
(interpreter mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import shift_gcn_tpu.ops.pallas.shift_gcn_kernel as pk
from shift_gcn_tpu.ops.spatial_shift import shift_gcn_transform


@pytest.fixture(autouse=True)
def interpret_mode():
    pk._INTERPRET = True
    yield
    pk._INTERPRET = False


def _case(r=70, v=25, c=16, d=24, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((r, v, c)).astype(np.float32)
    mask = rng.standard_normal((1, v, c)).astype(np.float32)
    w = rng.standard_normal((c, d)).astype(np.float32)
    b = rng.standard_normal((1, 1, d)).astype(np.float32)
    return x, mask, w, b


@pytest.mark.parametrize("v,c,d", [(25, 16, 24), (33, 8, 8), (25, 3, 16)])
def test_forward_matches_reference(v, c, d):
    x, mask, w, b = _case(r=70, v=v, c=c, d=d)
    want = np.asarray(shift_gcn_transform(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), jnp.asarray(mask)))
    gate = np.tanh(mask[0]) + 1.0
    got = np.asarray(pk.fused_shift_gcn(
        jnp.asarray(x), jnp.asarray(gate), jnp.asarray(w),
        jnp.asarray(b.reshape(-1)), 32))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_grads_match_reference():
    x, mask, w, b = _case(r=40, v=25, c=8, d=12)
    g_out = np.random.default_rng(9).standard_normal(
        (40, 25, 12)).astype(np.float32)

    def ref_loss(x_, mask_, w_, b_):
        out = shift_gcn_transform(x_, w_, b_, mask_)
        return jnp.sum(out * g_out)

    def pal_loss(x_, mask_, w_, b_):
        gate = jnp.tanh(mask_[0]) + 1.0
        out = pk.fused_shift_gcn(x_, gate, w_, b_.reshape(-1), 32)
        return jnp.sum(out * g_out)

    args = tuple(map(jnp.asarray, (x, mask, w, b)))
    ref_grads = jax.grad(ref_loss, argnums=(0, 1, 2, 3))(*args)
    pal_grads = jax.grad(pal_loss, argnums=(0, 1, 2, 3))(*args)
    for name, a, bb in zip(("dx", "dmask", "dw", "db"), ref_grads,
                           pal_grads):
        np.testing.assert_allclose(
            np.asarray(a).reshape(-1), np.asarray(bb).reshape(-1),
            atol=3e-3, rtol=1e-3, err_msg=name)


def test_bf16_activation_dtypes():
    """bf16 activations with f32 params: output and cotangents must carry
    each primal's own dtype (probe23 regression — jax.grad asserts on a
    f32 cotangent for a bf16 primal)."""
    x, mask, w, b = _case(r=40, v=25, c=8, d=12)
    x16 = jnp.asarray(x, dtype=jnp.bfloat16)
    gate = jnp.tanh(jnp.asarray(mask[0])) + 1.0
    w_, b_ = jnp.asarray(w), jnp.asarray(b.reshape(-1))

    out = pk.fused_shift_gcn(x16, gate, w_, b_, 32)
    assert out.dtype == jnp.bfloat16

    def loss(x_, gate_, w2, b2):
        return jnp.sum(pk.fused_shift_gcn(
            x_, gate_, w2, b2, 32).astype(jnp.float32))

    dx, dgate, dw, db = jax.grad(loss, argnums=(0, 1, 2, 3))(
        x16, gate, w_, b_)
    assert dx.dtype == jnp.bfloat16
    assert dgate.dtype == jnp.float32
    assert dw.dtype == jnp.float32
    assert db.dtype == jnp.float32

    # numerics still track the f32 run at bf16 tolerance
    ref = jax.grad(loss, argnums=(0,))(
        jnp.asarray(x), gate, w_, b_)[0]
    np.testing.assert_allclose(
        np.asarray(dx, dtype=np.float32), np.asarray(ref),
        atol=0.15, rtol=0.05)
