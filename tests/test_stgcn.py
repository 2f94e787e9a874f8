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


def _embed_cfg():
    import dataclasses

    return dataclasses.replace(_tiny_cfg(), adaptive_embed=4)


class TestAdaptiveAttention:
    """Data-dependent adjacency (2s-AGCN-style C term, dense SDDMM +
    softmax) in the stgcn family."""

    def test_attention_matches_numpy(self):
        rng = np.random.default_rng(3)
        n, t, v, c, k, d = 2, 5, 25, 8, 3, 4
        x = rng.standard_normal((n, t, v, c)).astype(np.float32)
        theta = rng.standard_normal((k, c, d)).astype(np.float32)
        phi = rng.standard_normal((k, c, d)).astype(np.float32)
        got = np.asarray(stgcn.adaptive_attention(
            jnp.asarray(x), jnp.asarray(theta), jnp.asarray(phi)))
        a = np.einsum("ntvc,kcd->knvtd", x, theta)
        b = np.einsum("ntuc,kcd->knutd", x, phi)
        scores = np.einsum("knvtd,knutd->knvu", a, b) / t
        e = np.exp(scores - scores.max(-1, keepdims=True))
        want = e / e.sum(-1, keepdims=True)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
        # rows are distributions
        np.testing.assert_allclose(got.sum(-1), 1.0, atol=1e-5)

    def test_model_runs_and_embeddings_get_gradient(self):
        cfg = _embed_cfg()
        params, state = stgcn.init_params(jax.random.key(1), cfg)
        assert params["l1"]["theta"].shape == (3, 3, 4)
        x = jnp.asarray(np.random.default_rng(4).standard_normal(
            (2, 3, 12, 25, 1)), jnp.float32)
        logits, _ = stgcn.apply(params, state, x, cfg, training=True)
        assert logits.shape == (2, 3)

        def loss(p):
            out, _ = stgcn.apply(p, state, x, cfg, training=True)
            return jnp.sum(out ** 2)

        grads = jax.grad(loss)(params)
        assert float(jnp.abs(grads["l1"]["theta"]).sum()) > 0
        assert float(jnp.abs(grads["l2"]["phi"]).sum()) > 0

    def test_edge_partitioned_training_still_matches_dense(self):
        """The attention term is computed densely in both paths, so the
        edge-sharded train step stays exactly equal to dense."""
        from jax.sharding import Mesh

        from shift_gcn_tpu.parallel.edge_partition import (
            make_edge_sharded_train_step)
        from shift_gcn_tpu.train.optim import build_weight_decay_tree
        from shift_gcn_tpu.train.state import (
            create_train_state, make_train_step)

        cfg = _embed_cfg()
        state = create_train_state(
            jax.random.key(2), cfg, init_fn=stgcn.init_params)
        wd = build_weight_decay_tree(state.params)
        rng = np.random.default_rng(5)
        batch = {
            "data": rng.standard_normal((4, 3, 12, 25, 1)).astype(
                np.float32),
            "label": rng.integers(0, 3, 4).astype(np.int32),
        }
        lr = jnp.asarray(0.1, jnp.float32)
        s_ref, m_ref = jax.jit(make_train_step(cfg, wd,
                                               apply_fn=stgcn.apply))(
            state, batch, lr)
        mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4),
                    ("data", "model"))
        s_ep, m_ep = jax.jit(make_edge_sharded_train_step(
            cfg, wd, mesh, batch_axis="data", edge_axis="model"))(
            state, batch, lr)
        np.testing.assert_allclose(float(m_ref["loss"]),
                                   float(m_ep["loss"]), atol=1e-5)
        flat = dict(jax.tree_util.tree_leaves_with_path(s_ep.params))
        for path, leaf in jax.tree_util.tree_leaves_with_path(s_ref.params):
            np.testing.assert_allclose(
                np.asarray(flat[path]), np.asarray(leaf), atol=3e-5,
                err_msg=jax.tree_util.keystr(path))
