"""Full-model activation parity vs a torch oracle.

The oracle re-expresses the reference forward math (model/shift_gcn.py
semantics, documented in SURVEY.md §2/§3.3) directly in torch, consuming the
*same* parameter pytree our init produced (params are stored torch-shaped).
This is the per-layer allclose requirement from BASELINE.json, executed on
a reduced backbone (full 10-block at T=300 is CPU-prohibitive; block
structure is identical, so 4 blocks incl. both stride-2 and channel-change
cases cover every code path).
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from shift_gcn_tpu.models.shift_gcn import (
    BlockSpec, ModelConfig, apply, init_params)


def _np(x):
    return np.asarray(x)


def _torch_temporal_shift(x, xpos, ypos, stride):
    """Reference CUDA forward semantics in torch: bilinear corner sum over
    (N, C, T, V) with zero out-of-range reads; +0.5 on ypos for stride!=1.

    Vectorized over (N, T, V) per channel (the per-element loop form is
    equivalent but too slow for full-size T=128+ parity tests)."""
    if stride != 1:
        ypos = ypos + 0.5
    n, c, t_in, v_in = x.shape
    t_out = t_in // stride
    xn = x.numpy()
    out = np.zeros((n, c, t_out, v_in), dtype=xn.dtype)
    for ch in range(c):
        xv = float(xpos[ch])
        yv = float(ypos[ch])
        x1, y1 = int(np.floor(xv)), int(np.floor(yv))
        dx, dy = xv - x1, yv - y1
        for (ti, vi, w) in (
                (y1, x1, (1 - dx) * (1 - dy)),
                (y1, x1 + 1, dx * (1 - dy)),
                (y1 + 1, x1, (1 - dx) * dy),
                (y1 + 1, x1 + 1, dx * dy)):
            if w == 0.0:
                continue
            t_src = np.arange(t_out) * stride + ti
            v_src = np.arange(v_in) + vi
            t_ok = np.nonzero((t_src >= 0) & (t_src < t_in))[0]
            v_ok = np.nonzero((v_src >= 0) & (v_src < v_in))[0]
            if not len(t_ok) or not len(v_ok):
                continue
            sub = xn[:, ch][np.ix_(range(n), t_src[t_ok], v_src[v_ok])]
            out[:, ch][np.ix_(range(n), t_ok, v_ok)] += w * sub
    return torch.as_tensor(out)


def _torch_bn(x, p, s, dims, training):
    """Functional BN over feature dims given flat torch-shaped params."""
    return F.batch_norm(
        x, torch.as_tensor(_np(s["running_mean"])).double(),
        torch.as_tensor(_np(s["running_var"])).double(),
        torch.as_tensor(_np(p["weight"])).double(),
        torch.as_tensor(_np(p["bias"])).double(),
        training=training, momentum=0.1, eps=1e-5)


def _torch_shift_gcn(x, p, s, v, training):
    """(N, C, T, V) -> (N, C_out, T, V): reference Shift_gcn math."""
    n, cin, t, _ = x.shape
    w = torch.as_tensor(_np(p["Linear_weight"])).double()
    cout = w.shape[1]
    h = x.permute(0, 2, 3, 1).reshape(n * t, v * cin)
    idx_in = torch.tensor(
        [(i * cin + j + j * cin) % (cin * v)
         for i in range(v) for j in range(cin)])
    h = torch.index_select(h, 1, idx_in).reshape(n * t, v, cin)
    mask = torch.as_tensor(_np(p["Feature_Mask"])).double()
    h = h * (torch.tanh(mask) + 1)
    h = torch.einsum("nwc,cd->nwd", h, w)
    h = h + torch.as_tensor(_np(p["Linear_bias"])).double()
    idx_out = torch.tensor(
        [(i * cout + j - j * cout) % (cout * v)
         for i in range(v) for j in range(cout)])
    h = torch.index_select(h.reshape(n * t, v * cout), 1, idx_out)
    h = _torch_bn(h, p["bn"], s["bn"], 1, training)
    h = h.reshape(n, t, v, cout).permute(0, 3, 1, 2)
    if "down" in p:
        res = F.conv2d(x, torch.as_tensor(_np(p["down"]["conv"]["weight"])).double(),
                       torch.as_tensor(_np(p["down"]["conv"]["bias"])).double())
        res = _torch_bn(res, p["down"]["bn"], s["down"]["bn"], 1, training)
    else:
        res = x
    return F.relu(h + res)


def _torch_shift_tcn(x, p, s, stride, training):
    h = _torch_bn(x, p["bn"], s["bn"], 1, training)
    h = _torch_temporal_shift(
        h, _np(p["shift_in"]["xpos"]), _np(p["shift_in"]["ypos"]), 1)
    h = F.conv2d(h, torch.as_tensor(_np(p["temporal_linear"]["weight"])).double(),
                 torch.as_tensor(_np(p["temporal_linear"]["bias"])).double())
    h = F.relu(h)
    h = _torch_temporal_shift(
        h, _np(p["shift_out"]["xpos"]), _np(p["shift_out"]["ypos"]), stride)
    return _torch_bn(h, p["bn2"], s["bn2"], 1, training)


def _torch_forward(params, state, x_np, blocks, num_person, training):
    """Full reference forward in torch float64."""
    x = torch.as_tensor(x_np).double()
    n, c, t, v, m = x.shape
    h = x.permute(0, 4, 3, 1, 2).reshape(n, m * v * c, t)
    h = _torch_bn(h, params["data_bn"], state["data_bn"], 1, training)
    h = h.reshape(n, m, v, c, t).permute(0, 1, 3, 4, 2).reshape(
        n * m, c, t, v)
    for i, spec in enumerate(blocks):
        bp, bs = params[f"l{i + 1}"], state[f"l{i + 1}"]
        g = _torch_shift_gcn(h, bp["gcn1"], bs["gcn1"], v, training)
        tcn = _torch_shift_tcn(g, bp["tcn1"], bs["tcn1"], spec.stride,
                               training)
        if not spec.residual:
            res = torch.zeros_like(tcn)
        elif "residual" in bp:
            res = F.conv2d(
                h, torch.as_tensor(_np(bp["residual"]["conv"]["weight"])).double(),
                torch.as_tensor(_np(bp["residual"]["conv"]["bias"])).double(),
                stride=(spec.stride, 1))
            res = _torch_bn(res, bp["residual"]["bn"],
                            bs["residual"]["bn"], 1, training)
        else:
            res = h
        h = F.relu(tcn + res)
    cf = h.shape[1]
    h = h.reshape(n, m, cf, -1).mean(3).mean(1)
    w = torch.as_tensor(_np(params["fc"]["weight"])).double()
    b = torch.as_tensor(_np(params["fc"]["bias"])).double()
    return h @ w.T + b


@pytest.fixture(scope="module")
def setup():
    config = ModelConfig(
        num_class=5, num_point=25, num_person=2, graph="ntu_rgb_d",
        blocks=(
            BlockSpec(3, 8, residual=False),
            BlockSpec(8, 8),
            BlockSpec(8, 12, stride=2),
            BlockSpec(12, 12),
        ))
    params, state = init_params(jax.random.key(42), config)
    # randomize BN running stats + shift positions so eval parity is
    # non-trivial and ypos exercises multiple integer cells
    rng = np.random.default_rng(0)

    def jitter(path, leaf):
        name = ".".join(str(getattr(k, "key", "")) for k in path)
        if "running_mean" in name:
            return jnp.asarray(
                rng.standard_normal(leaf.shape).astype(np.float32) * 0.1)
        if "running_var" in name:
            return jnp.asarray(
                1.0 + 0.3 * rng.random(leaf.shape).astype(np.float32))
        return leaf

    state = jax.tree_util.tree_map_with_path(jitter, state)
    x = rng.standard_normal((2, 3, 12, 25, 2)).astype(np.float32)
    return config, params, state, x


def test_eval_forward_matches_torch_oracle(setup):
    config, params, state, x = setup
    got, _ = apply(params, state, jnp.asarray(x), config, training=False)
    want = _torch_forward(
        jax.tree_util.tree_map(_np, params),
        jax.tree_util.tree_map(_np, state),
        x, config.blocks, config.num_person, training=False)
    np.testing.assert_allclose(
        _np(got), want.numpy(), atol=2e-4, rtol=1e-3)


def test_train_forward_matches_torch_oracle(setup):
    config, params, state, x = setup
    got, new_state = apply(params, state, jnp.asarray(x), config,
                           training=True)
    want = _torch_forward(
        jax.tree_util.tree_map(_np, params),
        jax.tree_util.tree_map(_np, state),
        x, config.blocks, config.num_person, training=True)
    np.testing.assert_allclose(
        _np(got), want.numpy(), atol=2e-4, rtol=1e-3)
    # BN counters advanced once per BN layer
    assert int(new_state["data_bn"]["num_batches_tracked"]) == 1
