"""Batch norm vs torch.nn.BatchNorm1d/2d (training and eval, running stats)."""

import numpy as np
import jax.numpy as jnp
import torch

from shift_gcn_tpu.ops import batch_norm, init_bn


def test_bn2d_training_matches_torch():
    rng = np.random.default_rng(0)
    n, t, v, c = 4, 6, 5, 8
    x = rng.standard_normal((n, t, v, c)).astype(np.float32)

    ref = torch.nn.BatchNorm2d(c)
    with torch.no_grad():
        ref.weight.uniform_(0.5, 1.5)
        ref.bias.uniform_(-0.5, 0.5)
    ref.train()
    # torch layout (N, C, T, V)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    want = ref(xt).detach().numpy().transpose(0, 2, 3, 1)

    params, state = init_bn(c)
    params = {
        "weight": jnp.asarray(ref.weight.detach().numpy()),
        "bias": jnp.asarray(ref.bias.detach().numpy()),
    }
    got, new_state = batch_norm(
        jnp.asarray(x), params, state, reduce_axes=(0, 1, 2), training=True)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(new_state["running_mean"]),
        ref.running_mean.numpy(), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(new_state["running_var"]),
        ref.running_var.numpy(), atol=1e-5)


def test_bn1d_eval_uses_running_stats():
    rng = np.random.default_rng(1)
    n, f = 16, 10
    x = rng.standard_normal((n, f)).astype(np.float32)

    ref = torch.nn.BatchNorm1d(f)
    with torch.no_grad():
        ref.running_mean.uniform_(-1, 1)
        ref.running_var.uniform_(0.5, 2.0)
    ref.eval()
    want = ref(torch.from_numpy(x)).detach().numpy()

    params, state = init_bn(f)
    state = {
        "running_mean": jnp.asarray(ref.running_mean.numpy()),
        "running_var": jnp.asarray(ref.running_var.numpy()),
        "num_batches_tracked": jnp.zeros((), jnp.int32),
    }
    got, out_state = batch_norm(
        jnp.asarray(x), params, state, reduce_axes=(0,), training=False)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)
    assert out_state is state


def test_bn_lp_normalize_matches_fp32_path(monkeypatch):
    """SGT_BN_LP=1 on bf16 input: same math within bf16 rounding, identical
    (fp32) running-stat updates, and a no-op for fp32 input."""
    rng = np.random.default_rng(3)
    n, t, v, c = 4, 6, 5, 8
    x = rng.standard_normal((n, t, v, c)).astype(np.float32)
    params, state = init_bn(c)
    params = {
        "weight": jnp.asarray(rng.uniform(0.5, 1.5, c).astype(np.float32)),
        "bias": jnp.asarray(rng.uniform(-0.5, 0.5, c).astype(np.float32)),
    }
    for training in (True, False):
        want, want_state = batch_norm(
            jnp.asarray(x, jnp.bfloat16), params, state,
            reduce_axes=(0, 1, 2), training=training)
        monkeypatch.setenv("SGT_BN_LP", "1")
        got, got_state = batch_norm(
            jnp.asarray(x, jnp.bfloat16), params, state,
            reduce_axes=(0, 1, 2), training=training)
        got32, _ = batch_norm(
            jnp.asarray(x), params, state,
            reduce_axes=(0, 1, 2), training=training)
        monkeypatch.delenv("SGT_BN_LP")
        assert got.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            atol=0.05)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(got32), atol=0.05)
        if training:
            np.testing.assert_allclose(
                np.asarray(got_state["running_mean"]),
                np.asarray(want_state["running_mean"]), atol=1e-7)
            np.testing.assert_allclose(
                np.asarray(got_state["running_var"]),
                np.asarray(want_state["running_var"]), atol=1e-7)


def test_bn_lp_eval_default(monkeypatch):
    """Eval-mode bf16 BN uses the low-precision normalize by default
    (+7% eval throughput, scratch/bnlp_eval_r2.log); SGT_BN_LP_EVAL=0
    restores the fp32 pass; training mode is unaffected by the eval
    flag."""
    rng = np.random.default_rng(5)
    x = rng.standard_normal((4, 6, 5, 8)).astype(np.float32)
    params, state = init_bn(8)
    state = dict(state, running_mean=jnp.asarray(
        rng.standard_normal(8).astype(np.float32) * 0.1))

    xb = jnp.asarray(x, jnp.bfloat16)
    got_default, _ = batch_norm(
        xb, params, state, reduce_axes=(0, 1, 2), training=False)
    monkeypatch.setenv("SGT_BN_LP_EVAL", "0")
    got_fp32, _ = batch_norm(
        xb, params, state, reduce_axes=(0, 1, 2), training=False)
    monkeypatch.delenv("SGT_BN_LP_EVAL")
    assert got_default.dtype == jnp.bfloat16
    # same math within bf16 rounding
    np.testing.assert_allclose(
        np.asarray(got_default, np.float32),
        np.asarray(got_fp32, np.float32), atol=0.05)
    # training path ignores the eval flag (fp32 normalize unless SGT_BN_LP)
    a, _ = batch_norm(xb, params, state, reduce_axes=(0, 1, 2),
                      training=True)
    monkeypatch.setenv("SGT_BN_LP_EVAL", "0")
    b, _ = batch_norm(xb, params, state, reduce_axes=(0, 1, 2),
                      training=True)
    monkeypatch.delenv("SGT_BN_LP_EVAL")
    np.testing.assert_array_equal(
        np.asarray(a, np.float32), np.asarray(b, np.float32))


def test_bn_lp_normalize_fp32_passthrough(monkeypatch):
    monkeypatch.setenv("SGT_BN_LP", "1")
    rng = np.random.default_rng(4)
    x = rng.standard_normal((16, 10)).astype(np.float32)
    params, state = init_bn(10)
    got, _ = batch_norm(
        jnp.asarray(x), params, state, reduce_axes=(0,), training=True)
    monkeypatch.delenv("SGT_BN_LP")
    want, _ = batch_norm(
        jnp.asarray(x), params, state, reduce_axes=(0,), training=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_bn_multi_step_running_stats_match_torch():
    rng = np.random.default_rng(2)
    f = 7
    ref = torch.nn.BatchNorm1d(f)
    ref.train()
    params, state = init_bn(f)
    for i in range(3):
        x = rng.standard_normal((32, f)).astype(np.float32)
        ref(torch.from_numpy(x))
        _, state = batch_norm(
            jnp.asarray(x), params, state, reduce_axes=(0,), training=True)
    np.testing.assert_allclose(
        np.asarray(state["running_mean"]), ref.running_mean.numpy(), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(state["running_var"]), ref.running_var.numpy(), atol=1e-5)
    assert int(state["num_batches_tracked"]) == 3
