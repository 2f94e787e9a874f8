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
