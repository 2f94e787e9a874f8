"""Spatial shift op vs an independent flat-index formulation.

The oracle below re-derives the reference index rule
(model/shift_gcn.py:108-118) directly on the flattened (V*C) axis, in the
reference's (NT, V*C) layout, and compares against our channels-last gather.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from shift_gcn_tpu.ops import spatial_shift, spatial_shift_onehot, shift_gcn_transform


def _flat_shift_oracle(x_flat: np.ndarray, v: int, c: int, sign: int) -> np.ndarray:
    """x_flat: (N, V*C). out[:, i*C+j] = x[:, (i*C + j + sign*j*C) mod (V*C)]."""
    idx = np.empty(v * c, dtype=np.int64)
    for i in range(v):
        for j in range(c):
            idx[i * c + j] = (i * c + j + sign * j * c) % (c * v)
    return x_flat[:, idx]


@pytest.mark.parametrize("v,c", [(25, 64), (33, 3), (5, 7)])
@pytest.mark.parametrize("sign", [+1, -1])
def test_matches_flat_index_rule(v, c, sign):
    rng = np.random.default_rng(0)
    n = 4
    x = rng.standard_normal((n, v, c)).astype(np.float32)
    want = _flat_shift_oracle(x.reshape(n, v * c), v, c, sign).reshape(n, v, c)
    got = np.asarray(spatial_shift(jnp.asarray(x), sign))
    np.testing.assert_array_equal(got, want)


def test_onehot_path_matches_gather():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 7, 25, 16)).astype(np.float32)
    a = np.asarray(spatial_shift(jnp.asarray(x), +1))
    b = np.asarray(spatial_shift_onehot(jnp.asarray(x), +1))
    np.testing.assert_allclose(a, b, atol=1e-6)


@pytest.mark.parametrize("v,c", [(33, 64), (25, 3), (33, 256), (7, 5)])
@pytest.mark.parametrize("sign", [+1, -1])
def test_roll_path_matches_gather(v, c, sign):
    from shift_gcn_tpu.ops.spatial_shift import spatial_shift_roll

    rng = np.random.default_rng(2)
    x = rng.standard_normal((3, v, c)).astype(np.float32)
    a = np.asarray(spatial_shift(jnp.asarray(x), sign))
    b = np.asarray(spatial_shift_roll(jnp.asarray(x), sign))
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("v,cin,cout", [(33, 64, 64), (25, 3, 64), (7, 5, 9)])
def test_circconv_transform_matches_chain(v, cin, cout, monkeypatch):
    import jax
    from shift_gcn_tpu.ops.spatial_shift import shift_gcn_transform_circconv

    monkeypatch.setenv("SGT_SGCN_IMPL", "chain")  # baseline = explicit chain
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, 4, v, cin)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((cin, cout)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal((cout,)), jnp.float32)
    fm = jnp.asarray(rng.standard_normal((1, v, cin)), jnp.float32)
    a = np.asarray(shift_gcn_transform(x, w, b, fm))
    c = np.asarray(shift_gcn_transform_circconv(x, w, b, fm))
    np.testing.assert_allclose(c, a, atol=5e-5)

    def make_loss(fn):
        def f(xx, ww, fmm):
            return jnp.sum(fn(xx, ww, b, fmm) ** 2)
        return jax.grad(f, argnums=(0, 1, 2))

    for ga, gc in zip(make_loss(shift_gcn_transform)(x, w, fm),
                      make_loss(shift_gcn_transform_circconv)(x, w, fm)):
        np.testing.assert_allclose(np.asarray(gc), np.asarray(ga),
                                   rtol=2e-4, atol=1e-4)


@pytest.mark.parametrize("v,cin,cout", [(33, 64, 64), (25, 3, 64), (7, 5, 9),
                                        (32, 16, 16)])
def test_dft_transform_matches_chain(v, cin, cout, monkeypatch):
    import jax
    from shift_gcn_tpu.ops.spatial_shift import shift_gcn_transform_dft

    monkeypatch.setenv("SGT_SGCN_IMPL", "chain")  # baseline = explicit chain
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((2, 4, v, cin)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((cin, cout)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal((cout,)), jnp.float32)
    fm = jnp.asarray(rng.standard_normal((1, v, cin)), jnp.float32)
    a = np.asarray(shift_gcn_transform(x, w, b, fm))
    c = np.asarray(shift_gcn_transform_dft(x, w, b, fm))
    np.testing.assert_allclose(c, a, atol=5e-5)

    def make_loss(fn):
        def f(xx, ww, fmm):
            return jnp.sum(fn(xx, ww, b, fmm) ** 2)
        return jax.grad(f, argnums=(0, 1, 2))

    for ga, gc in zip(make_loss(shift_gcn_transform)(x, w, fm),
                      make_loss(shift_gcn_transform_dft)(x, w, fm)):
        np.testing.assert_allclose(np.asarray(gc), np.asarray(ga),
                                   rtol=2e-4, atol=1e-4)


def test_env_selects_dft_impl(monkeypatch):
    monkeypatch.setenv("SGT_SGCN_IMPL", "dft")
    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.standard_normal((2, 4, 33, 8)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((8, 8)) * 0.1, jnp.float32)
    b = jnp.zeros((8,), jnp.float32)
    fm = jnp.asarray(rng.standard_normal((1, 33, 8)), jnp.float32)
    a = np.asarray(shift_gcn_transform(x, w, b, fm))
    monkeypatch.setenv("SGT_SGCN_IMPL", "chain")
    c = np.asarray(shift_gcn_transform(x, w, b, fm))
    np.testing.assert_allclose(a, c, atol=5e-5)


def test_env_selects_circconv_impl(monkeypatch):
    monkeypatch.setenv("SGT_SGCN_IMPL", "circconv")
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.standard_normal((3, 25, 6)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((6, 8)) * 0.1, jnp.float32)
    b = jnp.zeros((8,), jnp.float32)
    fm = jnp.zeros((1, 25, 6), jnp.float32)
    got = np.asarray(shift_gcn_transform(x, w, b, fm))
    monkeypatch.setenv("SGT_SGCN_IMPL", "chain")
    want = np.asarray(shift_gcn_transform(x, w, b, fm))
    np.testing.assert_allclose(got, want, atol=5e-5)


def test_env_selects_roll_impl(monkeypatch):
    monkeypatch.setenv("SGT_SSHIFT_IMPL", "roll")
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 25, 8)).astype(np.float32)
    want = _flat_shift_oracle(x.reshape(2, 200), 25, 8, +1).reshape(2, 25, 8)
    got = np.asarray(spatial_shift(jnp.asarray(x), +1))
    np.testing.assert_array_equal(got, want)


def test_roundtrip_inverse():
    # shift_out with the same channel count undoes shift_in only when C==C';
    # check shift is a permutation (preserves multiset).
    rng = np.random.default_rng(2)
    x = rng.standard_normal((3, 25, 8)).astype(np.float32)
    y = np.asarray(spatial_shift(jnp.asarray(x), +1))
    for ch in range(8):
        np.testing.assert_allclose(
            np.sort(y[:, :, ch], axis=1), np.sort(x[:, :, ch], axis=1))


def test_full_transform_against_torch_reference_math():
    """shift -> tanh-mask -> matmul+bias -> shift, vs torch einsum oracle."""
    import torch

    rng = np.random.default_rng(3)
    n, t, v, cin, cout = 2, 3, 25, 8, 12
    x = rng.standard_normal((n * t, v, cin)).astype(np.float32)
    w = rng.standard_normal((cin, cout)).astype(np.float32)
    b = rng.standard_normal((1, 1, cout)).astype(np.float32)
    mask = rng.standard_normal((1, v, cin)).astype(np.float32)

    # torch oracle in the reference layout
    xt = torch.from_numpy(x.reshape(n * t, v * cin))
    idx_in = torch.from_numpy(
        np.array([(i * cin + j + j * cin) % (cin * v)
                  for i in range(v) for j in range(cin)]))
    h = torch.index_select(xt, 1, idx_in).view(n * t, v, cin)
    h = h * (torch.tanh(torch.from_numpy(mask)) + 1)
    h = torch.einsum("nwc,cd->nwd", h, torch.from_numpy(w))
    h = h + torch.from_numpy(b)
    idx_out = torch.from_numpy(
        np.array([(i * cout + j - j * cout) % (cout * v)
                  for i in range(v) for j in range(cout)]))
    want = torch.index_select(h.reshape(n * t, v * cout), 1, idx_out)
    want = want.view(n * t, v, cout).numpy()

    got = np.asarray(shift_gcn_transform(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), jnp.asarray(mask)))
    np.testing.assert_allclose(got, want, atol=2e-5)
