"""Mesh-sharded code paths on the 8-device virtual CPU mesh: halo-exchange
sequence parallelism, edge-partitioned aggregation, DP train-step equality."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from shift_gcn_tpu.ops import temporal_shift
from shift_gcn_tpu.parallel.halo import sharded_temporal_shift
from shift_gcn_tpu.parallel.edge_partition import make_sharded_aggregator
from shift_gcn_tpu.ops.aggregate import edge_aggregate
from shift_gcn_tpu.graphs import NTU_RGB_D


def _mesh_1d(name="time", n=4):
    return Mesh(np.asarray(jax.devices()[:n]), (name,))


class TestShardedTemporalShift:
    @pytest.mark.parametrize("stride", [1, 2])
    def test_matches_unsharded(self, stride):
        rng = np.random.default_rng(0)
        n, t, v, c = 2, 64, 5, 6
        x = rng.standard_normal((n, t, v, c)).astype(np.float32)
        xpos = rng.uniform(-1e-8, 1e-8, c).astype(np.float32)
        ypos = rng.uniform(-3.0, 3.0, c).astype(np.float32)

        want = np.asarray(temporal_shift(
            jnp.asarray(x), jnp.asarray(xpos), jnp.asarray(ypos), stride))

        mesh = _mesh_1d(n=4)
        fn = jax.jit(jax.shard_map(
            lambda xb: sharded_temporal_shift(
                xb, jnp.asarray(xpos), jnp.asarray(ypos), stride, "time"),
            mesh=mesh,
            in_specs=P(None, "time"),
            out_specs=P(None, "time"),
        ))
        got = np.asarray(fn(jnp.asarray(x)))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_large_shift_crosses_shard_boundary(self):
        # integer shift of 5 frames with 16-frame shards: output rows near
        # the boundary must read the neighbor's frames, not zeros.
        n, t, v, c = 1, 64, 3, 2
        x = np.arange(n * t * v * c, dtype=np.float32).reshape(n, t, v, c)
        ypos = np.full(c, 5.0, np.float32)
        xpos = np.zeros(c, np.float32)
        want = np.zeros_like(x)
        want[:, :-5] = x[:, 5:]
        mesh = _mesh_1d(n=4)
        fn = jax.jit(jax.shard_map(
            lambda xb: sharded_temporal_shift(
                xb, jnp.asarray(xpos), jnp.asarray(ypos), 1, "time"),
            mesh=mesh, in_specs=P(None, "time"), out_specs=P(None, "time")))
        got = np.asarray(fn(jnp.asarray(x)))
        np.testing.assert_allclose(got, want, atol=1e-4)


class TestEdgePartitionedAggregate:
    def test_matches_dense_reference(self):
        graph = NTU_RGB_D
        edges = graph.coo()
        # merge the 3 subsets into one weighted edge list for this test
        rng = np.random.default_rng(0)
        b, v, c = 6, graph.num_nodes, 16
        x = rng.standard_normal((b, v, c)).astype(np.float32)

        want = np.asarray(edge_aggregate(
            jnp.asarray(x),
            {k: jnp.asarray(val) for k, val in edges.items()},
            v))

        mesh = Mesh(np.asarray(jax.devices()[:8]), ("model",))
        agg = make_sharded_aggregator(edges, v, mesh, "model")
        got = np.asarray(agg(jnp.asarray(x)))
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestDataParallelEquivalence:
    def test_dp_train_step_matches_single_device(self):
        """Same batch, 1-device vs 8-device 'data' sharding: identical loss
        and updated params (global-batch BN makes DP exactly equivalent)."""
        from shift_gcn_tpu.models.shift_gcn import BlockSpec, ModelConfig
        from shift_gcn_tpu.train.optim import build_weight_decay_tree
        from shift_gcn_tpu.train.state import (
            create_train_state, make_train_step)

        config = ModelConfig(
            num_class=2, num_point=25, num_person=1, graph="ntu_rgb_d",
            blocks=(BlockSpec(3, 8, residual=False),
                    BlockSpec(8, 16, stride=2)))
        state = create_train_state(jax.random.key(0), config)
        wd = build_weight_decay_tree(state.params)
        step = make_train_step(config, wd)

        rng = np.random.default_rng(0)
        batch_np = {
            "data": rng.standard_normal((16, 3, 8, 25, 1)).astype(np.float32),
            "label": rng.integers(0, 2, 16).astype(np.int32),
        }
        lr = jnp.asarray(0.1, jnp.float32)

        s1, m1 = jax.jit(step)(state, batch_np, lr)

        mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("data",))
        shard = NamedSharding(mesh, P("data"))
        batch_sharded = {k: jax.device_put(v, shard)
                         for k, v in batch_np.items()}
        s8, m8 = jax.jit(step)(state, batch_sharded, lr)

        np.testing.assert_allclose(
            float(m1["loss"]), float(m8["loss"]), atol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                        jax.tree_util.tree_leaves(s8.params)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-5)

    def test_fourstream_composes_with_data_sharding(self):
        """Stream-vmap x data-parallel sharding in one program: the
        fourstream step under an 8-device 'data' mesh matches the
        unsharded fourstream step exactly."""
        from shift_gcn_tpu.graphs import get_graph
        from shift_gcn_tpu.models.shift_gcn import BlockSpec, ModelConfig
        from shift_gcn_tpu.train import fourstream as fs
        from shift_gcn_tpu.train.optim import build_weight_decay_tree

        config = ModelConfig(
            num_class=2, num_point=25, num_person=1, graph="ntu_rgb_d",
            blocks=(BlockSpec(3, 8, residual=False),
                    BlockSpec(8, 16, stride=2)))
        graph = get_graph(config.graph)
        state4 = fs.create_fourstream_state(jax.random.key(0), config)
        wd = build_weight_decay_tree(jax.tree_util.tree_map(
            lambda x: x[0], state4.params))
        step = fs.make_fourstream_train_step(config, wd, graph)

        rng = np.random.default_rng(1)
        batch_np = {
            "data": rng.standard_normal((16, 3, 8, 25, 1)).astype(np.float32),
            "label": rng.integers(0, 2, 16).astype(np.int32),
        }
        lr = jnp.asarray(0.1, jnp.float32)
        s1, m1 = jax.jit(step)(state4, batch_np, lr)

        mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("data",))
        shard = NamedSharding(mesh, P("data"))
        batch_sharded = {k: jax.device_put(v, shard)
                         for k, v in batch_np.items()}
        s8, m8 = jax.jit(step)(state4, batch_sharded, lr)

        np.testing.assert_allclose(np.asarray(m1["loss"]),
                                   np.asarray(m8["loss"]), atol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                        jax.tree_util.tree_leaves(s8.params)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-5)


def _small_config():
    from shift_gcn_tpu.models.shift_gcn import BlockSpec, ModelConfig

    return ModelConfig(
        num_class=2, num_point=25, num_person=1, graph="ntu_rgb_d",
        blocks=(BlockSpec(3, 8, residual=False),
                BlockSpec(8, 16, stride=2)))


class TestTensorParallelTrainStep:
    """The Trainer's TP path: params committed to the mesh.state_shardings
    rules on a (4, 2) mesh give the same training trajectory as a single
    device (XLA SPMD inserts the activation collectives)."""

    def test_tp_sharded_state_matches_single_device(self):
        from shift_gcn_tpu.parallel import mesh as mesh_lib
        from shift_gcn_tpu.train.optim import build_weight_decay_tree
        from shift_gcn_tpu.train.state import (
            create_train_state, make_train_step)

        config = _small_config()
        state = create_train_state(jax.random.key(0), config)
        wd = build_weight_decay_tree(state.params)
        step = make_train_step(config, wd)
        rng = np.random.default_rng(5)
        batch = {
            "data": rng.standard_normal((8, 3, 16, 25, 1)).astype(np.float32),
            "label": rng.integers(0, 2, 8).astype(np.int32),
        }
        lr = jnp.asarray(0.1, jnp.float32)
        s_ref, m_ref = jax.jit(step)(state, batch, lr)

        mesh = mesh_lib.make_mesh((4, 2), devices=jax.devices()[:8])
        state_tp = jax.device_put(
            state, mesh_lib.state_shardings(mesh, state))
        batch_tp = mesh_lib.shard_batch(mesh, batch)
        s_tp, m_tp = jax.jit(step)(state_tp, batch_tp, lr)

        # the TP rules actually shard something (not a silent no-op)
        lw = s_tp.params["l1"]["gcn1"]["Linear_weight"]
        assert not lw.sharding.is_fully_replicated
        np.testing.assert_allclose(
            float(m_ref["loss"]), float(m_tp["loss"]), atol=1e-5)
        flat_tp = dict(jax.tree_util.tree_leaves_with_path(s_tp.params))
        for path, leaf in jax.tree_util.tree_leaves_with_path(s_ref.params):
            np.testing.assert_allclose(
                np.asarray(flat_tp[path]), np.asarray(leaf), atol=3e-5,
                err_msg=jax.tree_util.keystr(path))


class TestTensorParallelFourstream:
    """TP sharding rules on the fourstream (stream-stacked) pytrees: the
    stacked Linear_weight (S, C_in, C_out) shards its LAST axis and the
    sharded step matches the unsharded fourstream step."""

    def test_fourstream_tp_matches_unsharded(self):
        from shift_gcn_tpu.graphs import get_graph
        from shift_gcn_tpu.parallel import mesh as mesh_lib
        from shift_gcn_tpu.train import fourstream as fs
        from shift_gcn_tpu.train.optim import build_weight_decay_tree

        config = _small_config()
        graph = get_graph(config.graph)
        state4 = fs.create_fourstream_state(jax.random.key(0), config)
        wd = build_weight_decay_tree(jax.tree_util.tree_map(
            lambda x: x[0], state4.params))
        step = fs.make_fourstream_train_step(config, wd, graph)
        rng = np.random.default_rng(11)
        batch = {
            "data": rng.standard_normal((8, 3, 16, 25, 1)).astype(
                np.float32),
            "label": rng.integers(0, 2, 8).astype(np.int32),
        }
        lr = jnp.asarray(0.1, jnp.float32)
        s_ref, m_ref = jax.jit(step)(state4, batch, lr)

        mesh = mesh_lib.make_mesh((4, 2), devices=jax.devices()[:8])
        shardings = mesh_lib.state_shardings(mesh, state4)
        state_tp = jax.device_put(state4, shardings)
        lw = state_tp.params["l1"]["gcn1"]["Linear_weight"]
        assert lw.ndim == 3  # stream-stacked
        assert not lw.sharding.is_fully_replicated
        batch_tp = mesh_lib.shard_batch(mesh, batch)
        s_tp, m_tp = jax.jit(step)(state_tp, batch_tp, lr)

        np.testing.assert_allclose(np.asarray(m_ref["loss"]),
                                   np.asarray(m_tp["loss"]), atol=1e-5)
        flat = dict(jax.tree_util.tree_leaves_with_path(s_tp.params))
        for path, leaf in jax.tree_util.tree_leaves_with_path(
                s_ref.params):
            np.testing.assert_allclose(
                np.asarray(flat[path]), np.asarray(leaf), atol=3e-5,
                err_msg=jax.tree_util.keystr(path))


class TestTimeShardedTrainStep:
    """Full-model sequence parallelism: the shard_map T-sharded train step
    (parallel/seqpar.py) matches the unsharded step — including the
    constraint ypos updates — on the 8-device CPU mesh."""

    def _batch(self, n=4, t=160):
        rng = np.random.default_rng(3)
        return {
            "data": rng.standard_normal((n, 3, t, 25, 1)).astype(np.float32),
            "label": rng.integers(0, 2, n).astype(np.int32),
        }

    def test_matches_unsharded_train_step(self):
        from shift_gcn_tpu.parallel.seqpar import (
            make_time_sharded_train_step)
        from shift_gcn_tpu.train.optim import build_weight_decay_tree
        from shift_gcn_tpu.train.state import (
            create_train_state, make_train_step)

        config = _small_config()
        state = create_train_state(jax.random.key(0), config)
        wd = build_weight_decay_tree(state.params)
        batch = self._batch()
        lr = jnp.asarray(0.1, jnp.float32)

        s_ref, m_ref = jax.jit(make_train_step(config, wd))(
            state, batch, lr)

        mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4),
                    ("data", "time"))
        step = make_time_sharded_train_step(
            config, wd, mesh, batch_axis="data", time_axis="time")
        s_sp, m_sp = jax.jit(step)(state, batch, lr)

        np.testing.assert_allclose(
            float(m_ref["loss"]), float(m_sp["loss"]), atol=1e-5)
        flat_ref = jax.tree_util.tree_leaves_with_path(s_ref.params)
        flat_sp = dict(jax.tree_util.tree_leaves_with_path(s_sp.params))
        for path, leaf in flat_ref:
            got = np.asarray(flat_sp[path])
            name = jax.tree_util.keystr(path)
            np.testing.assert_allclose(
                got, np.asarray(leaf), atol=3e-5, err_msg=name)
        # BN running stats (incl. the pmean'd batch stats) must agree too
        for path, a in jax.tree_util.tree_leaves_with_path(s_ref.bn_state):
            b = dict(jax.tree_util.tree_leaves_with_path(
                s_sp.bn_state))[path]
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), atol=3e-5,
                err_msg=jax.tree_util.keystr(path))

    def test_constraint_ypos_update_magnitude(self):
        """ypos grads through the sharded path keep the fixed +-0.01
        constraint magnitude (reference shift_cuda_kernel.cu:370-395)."""
        from shift_gcn_tpu.parallel.seqpar import (
            make_time_sharded_train_step)
        from shift_gcn_tpu.train.optim import build_weight_decay_tree
        from shift_gcn_tpu.train.state import create_train_state

        config = _small_config()
        state = create_train_state(jax.random.key(0), config)
        wd = build_weight_decay_tree(state.params)
        mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4),
                    ("data", "time"))
        step = make_time_sharded_train_step(
            config, wd, mesh, batch_axis="data", time_axis="time")
        s2, _ = jax.jit(step)(state, self._batch(), jnp.asarray(0.0))
        # lr=0 -> params unchanged; the momentum buffer holds
        # grad + wd * p (torch SGD), so subtract the decay term to
        # recover the raw constraint-magnitude ypos grads
        mom = np.asarray(
            s2.opt_state.momentum_buf["l1"]["tcn1"]["shift_in"]["ypos"])
        p = np.asarray(state.params["l1"]["tcn1"]["shift_in"]["ypos"])
        grad = mom - 1e-4 * p
        mags = np.abs(grad)
        ok = np.isclose(mags, 0.01, atol=1e-6) | np.isclose(
            mags, 1e-4, atol=1e-7)
        assert ok.all(), mags

    def test_rejects_stride_incompatible_sharding(self):
        """T=300 4-way sharded hits an odd T_local at the stride-2 block:
        must raise instead of silently dropping/phase-shifting frames."""
        from shift_gcn_tpu.models.shift_gcn import ModelConfig
        from shift_gcn_tpu.parallel.seqpar import validate_time_sharding

        full = ModelConfig(num_class=2, num_point=33, num_person=1,
                           graph="mediapipe_pose")
        with pytest.raises(ValueError, match="not divisible"):
            validate_time_sharding(full, 300, 2)  # 75 local odd at l8
        with pytest.raises(ValueError, match="time shards"):
            validate_time_sharding(full, 300, 8)  # 300 % 8 != 0
        validate_time_sharding(full, 304, 2)     # 152 -> 76 -> 38: ok
        validate_time_sharding(full, 320, 4)     # 80 -> 40 -> 20: ok
        small = _small_config()
        with pytest.raises(ValueError, match="max_shift"):
            validate_time_sharding(small, 32, 4)  # 8 local < max_shift+1

    def test_validation_uses_config_lowering_radius(self):
        """validate_time_sharding reads the radius from the model
        config's lowering, not process state: a larger configured
        radius needs more frames per shard (VERDICT r4 task 2)."""
        import dataclasses

        from shift_gcn_tpu.ops.lowering import Lowering
        from shift_gcn_tpu.parallel.seqpar import validate_time_sharding

        small = _small_config()                        # default radius 8
        validate_time_sharding(small, 48, 4)           # 12 >= 8+1: ok
        wide = dataclasses.replace(small,
                                   lowering=Lowering(max_shift=12))
        with pytest.raises(ValueError, match="max_shift\\+1=13"):
            validate_time_sharding(wide, 48, 4)        # 12 < 12+1

    @pytest.mark.slow
    def test_two_halo_radii_one_process(self):
        """The halo tap radius is a per-call static argument threaded
        from lowering.max_shift — NOT ambient process state: seqpar
        train steps with radius 4 and radius 8 run in ONE process and
        both match the unsharded step built with the same lowering
        (VERDICT r4 task 2 / advisor r4 medium)."""
        import dataclasses

        from shift_gcn_tpu.ops.lowering import Lowering
        from shift_gcn_tpu.parallel.seqpar import (
            make_time_sharded_train_step)
        from shift_gcn_tpu.train.optim import build_weight_decay_tree
        from shift_gcn_tpu.train.state import (
            create_train_state, make_train_step)

        batch = self._batch(t=64)
        lr = jnp.asarray(0.1, jnp.float32)
        mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4),
                    ("data", "time"))
        for radius in (4, 8):
            config = dataclasses.replace(
                _small_config(), lowering=Lowering(max_shift=radius))
            state = create_train_state(jax.random.key(0), config)
            wd = build_weight_decay_tree(state.params)
            s_ref, m_ref = jax.jit(make_train_step(config, wd))(
                state, batch, lr)
            step = make_time_sharded_train_step(
                config, wd, mesh, batch_axis="data", time_axis="time")
            s_sp, m_sp = jax.jit(step)(state, batch, lr)
            np.testing.assert_allclose(
                float(m_ref["loss"]), float(m_sp["loss"]), atol=1e-5)
            flat_sp = dict(jax.tree_util.tree_leaves_with_path(
                s_sp.params))
            for path, leaf in jax.tree_util.tree_leaves_with_path(
                    s_ref.params):
                np.testing.assert_allclose(
                    np.asarray(flat_sp[path]), np.asarray(leaf),
                    atol=3e-5,
                    err_msg=f"radius={radius} {jax.tree_util.keystr(path)}")

    @pytest.mark.slow
    def test_full_backbone_eval_matches_unsharded(self):
        """The shipped 10-block backbone under sequence parallelism at a
        padded production length (T=320, 4-way): logits equal the
        unsharded forward."""
        from shift_gcn_tpu.models.shift_gcn import ModelConfig
        from shift_gcn_tpu.parallel.seqpar import (
            make_time_sharded_eval_step)
        from shift_gcn_tpu.train.state import (
            create_train_state, make_eval_step)

        config = ModelConfig(
            num_class=2, num_point=33, num_person=1,
            graph="mediapipe_pose")
        state = create_train_state(jax.random.key(4), config)
        rng = np.random.default_rng(9)
        batch = {
            "data": rng.standard_normal(
                (2, 3, 320, 33, 1)).astype(np.float32),
            "label": rng.integers(0, 2, 2).astype(np.int32),
        }
        want, _, _ = jax.jit(make_eval_step(config))(
            state.params, state.bn_state, batch)
        mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4),
                    ("data", "time"))
        got, _, _ = jax.jit(make_time_sharded_eval_step(
            config, mesh, batch_axis="data", time_axis="time"))(
                state.params, state.bn_state, batch)
        # untrained-init logits are O(700); tolerance is relative
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-4)

    def test_eval_step_matches_unsharded(self):
        from shift_gcn_tpu.parallel.seqpar import (
            make_time_sharded_eval_step)
        from shift_gcn_tpu.train.state import (
            create_train_state, make_eval_step)

        config = _small_config()
        state = create_train_state(jax.random.key(0), config)
        batch = self._batch()
        want, lsum_w, n_w = jax.jit(make_eval_step(config))(
            state.params, state.bn_state, batch)
        mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4),
                    ("data", "time"))
        got, lsum_g, n_g = jax.jit(make_time_sharded_eval_step(
            config, mesh, batch_axis="data", time_axis="time"))(
                state.params, state.bn_state, batch)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)
        np.testing.assert_allclose(float(lsum_g), float(lsum_w), atol=1e-4)


class TestRingTraining:
    """Ring strategy TRAINING demo (VERDICT r2 stretch): a synthetic
    large-V GNN whose node features stay sharded end to end — two
    ring-aggregated layers, node-mean pooling psummed across shards —
    trains (loss + grads + SGD trajectory) exactly equal to its dense
    unsharded twin.  The regime ring exists for: V too large to
    replicate per device (edge_partition.py module docstring)."""

    V, C, H, P_SHARDS, B = 64, 8, 16, 8, 4

    def _graph(self):
        # sparse random digraph over V=64 nodes (8 per shard), with
        # cross-shard edges guaranteed by a stride-9 ring
        rng = np.random.default_rng(3)
        src = np.arange(self.V, dtype=np.int32)
        dst = ((src * 9 + 5) % self.V).astype(np.int32)
        extra = rng.integers(0, self.V, (2, 40)).astype(np.int32)
        return {
            "src": np.concatenate([src, extra[0]]),
            "dst": np.concatenate([dst, extra[1]]),
            "weight": rng.uniform(0.5, 1.5, self.V + 40).astype(np.float32),
        }

    def _params_and_data(self):
        rng = np.random.default_rng(11)
        params = {
            "w1": rng.standard_normal((self.C, self.H)).astype(np.float32)
            * 0.3,
            "b1": np.zeros(self.H, np.float32),
            "w2": rng.standard_normal((self.H, self.H)).astype(np.float32)
            * 0.3,
            "b2": np.zeros(self.H, np.float32),
            "wo": rng.standard_normal((self.H, 2)).astype(np.float32) * 0.3,
        }
        params = jax.tree_util.tree_map(jnp.asarray, params)
        x = rng.standard_normal(
            (self.B, self.V, self.C)).astype(np.float32)
        y = rng.integers(0, 2, self.B).astype(np.int32)
        return params, jnp.asarray(x), jnp.asarray(y)

    def _loss_dense(self, params, x, y, edges):
        e = {k: jnp.asarray(v) for k, v in edges.items()}
        h = jax.nn.relu(
            edge_aggregate(x, e, self.V) @ params["w1"] + params["b1"])
        h = edge_aggregate(h, e, self.V) @ params["w2"] + params["b2"]
        logits = h.mean(axis=1) @ params["wo"]
        logp = jax.nn.log_softmax(logits)
        return -jnp.mean(jnp.take_along_axis(
            logp, y[:, None], axis=-1)), logits

    def _make_loss_ring(self, mesh, edges):
        from shift_gcn_tpu.parallel.edge_partition import (
            partition_edges_ring, ring_aggregate)

        steps, v_pad, v_loc = partition_edges_ring(
            edges, self.P_SHARDS, self.V)
        assert v_pad == self.V
        steps_dev = jax.tree_util.tree_map(
            lambda a: jax.device_put(
                a, NamedSharding(mesh, P("model"))), steps)
        step_specs = jax.tree_util.tree_map(lambda _: P("model"), steps)
        x_spec = P(None, "model", None)

        def loss(params, x, y):
            def inner(p, xb, sb):
                local = jax.tree_util.tree_map(lambda a: a[0], sb)
                h = jax.nn.relu(
                    ring_aggregate(xb, local, "model") @ p["w1"] + p["b1"])
                h = ring_aggregate(h, local, "model") @ p["w2"] + p["b2"]
                pooled = jax.lax.psum(h.sum(axis=1), "model") / self.V
                return pooled @ p["wo"]

            logits = jax.shard_map(
                inner, mesh=mesh,
                in_specs=(P(), x_spec, step_specs),
                out_specs=P(),
            )(params, x, steps_dev)
            logp = jax.nn.log_softmax(logits)
            return -jnp.mean(jnp.take_along_axis(
                logp, y[:, None], axis=-1)), logits

        return loss

    def test_node_sharded_model_trains_equal_to_dense(self):
        edges = self._graph()
        params, x, y = self._params_and_data()
        mesh = Mesh(np.asarray(jax.devices()[:self.P_SHARDS]).reshape(
            1, self.P_SHARDS), ("data", "model"))
        loss_ring = self._make_loss_ring(mesh, edges)

        grad_dense = jax.jit(jax.grad(
            lambda p, xx, yy: self._loss_dense(p, xx, yy, edges)[0]))
        grad_ring = jax.jit(jax.grad(
            lambda p, xx, yy: loss_ring(p, xx, yy)[0]))

        p_d = params
        p_r = jax.device_put(params, NamedSharding(mesh, P()))
        lr = 0.5
        for step in range(5):
            gd = grad_dense(p_d, x, y)
            gr = grad_ring(p_r, x, y)
            for k in p_d:
                np.testing.assert_allclose(
                    np.asarray(gr[k]), np.asarray(gd[k]), atol=1e-5,
                    err_msg=f"step {step} grad {k}")
            p_d = jax.tree_util.tree_map(
                lambda p_, g: p_ - lr * g, p_d, gd)
            p_r = jax.tree_util.tree_map(
                lambda p_, g: p_ - lr * g, p_r, gr)
        ld, _ = self._loss_dense(p_d, x, y, edges)
        lr_, _ = jax.jit(loss_ring)(p_r, x, y)
        np.testing.assert_allclose(float(lr_), float(ld), atol=1e-5)
        # it actually learned something
        l0, _ = self._loss_dense(params, x, y, edges)
        assert float(ld) < float(l0)


class TestRingEdgePartition:
    """Ring strategy: node features sharded over the axis, boundary
    blocks exchanged by ppermute, no replication and no final psum."""

    def _block_diagonal(self, b, graph):
        coo = graph.coo()
        v = graph.num_nodes
        off = np.arange(b, dtype=np.int64)[:, None] * v
        return {
            "src": (coo["src"][None] + off).reshape(-1).astype(np.int32),
            "dst": (coo["dst"][None] + off).reshape(-1).astype(np.int32),
            "weight": np.tile(coo["weight"], b).astype(np.float32),
        }, b * v

    @pytest.mark.parametrize("n_dev", [4, 8])
    def test_matches_dense_reference(self, n_dev):
        graph = NTU_RGB_D
        edges = graph.coo()
        rng = np.random.default_rng(0)
        b, v, c = 3, graph.num_nodes, 16
        x = rng.standard_normal((b, v, c)).astype(np.float32)
        want = np.asarray(edge_aggregate(
            jnp.asarray(x),
            {k: jnp.asarray(val) for k, val in edges.items()}, v))
        mesh = Mesh(np.asarray(jax.devices()[:n_dev]), ("model",))
        agg = make_sharded_aggregator(edges, v, mesh, "model",
                                      strategy="ring")
        got = np.asarray(agg(jnp.asarray(x)))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_block_diagonal_batched_graph(self):
        """The production shape: many clips' graphs as one block-diagonal
        problem, nodes and edges both sharded."""
        graph = NTU_RGB_D
        b = 6
        edges, n_nodes = self._block_diagonal(b, graph)
        rng = np.random.default_rng(1)
        c = 8
        x = rng.standard_normal((1, n_nodes, c)).astype(np.float32)
        want = np.asarray(edge_aggregate(
            jnp.asarray(x),
            {k: jnp.asarray(v) for k, v in edges.items()}, n_nodes))
        mesh = Mesh(np.asarray(jax.devices()[:8]), ("model",))
        agg = make_sharded_aggregator(edges, n_nodes, mesh, "model",
                                      strategy="ring")
        got = np.asarray(agg(jnp.asarray(x)))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_partitioner_buckets_by_arrival_step(self):
        from shift_gcn_tpu.parallel.edge_partition import (
            partition_edges_ring)

        # 4 nodes over 2 shards; edge (src=3 -> dst=0) must sit in
        # owner 0's bucket r=1 (shard 1's block arrives on step 1)
        edges = {"src": np.array([3, 0]), "dst": np.array([0, 2]),
                 "weight": np.array([2.0, 3.0], np.float32)}
        steps, v_pad, v_loc = partition_edges_ring(edges, 2, 4)
        assert (v_pad, v_loc) == (4, 2)
        assert steps[1]["weight"][0, 0] == 2.0   # owner 0, step 1
        assert steps[1]["src_local"][0, 0] == 1  # 3 % 2
        assert steps[1]["weight"][1, 0] == 3.0   # dst 2 -> owner 1; src
        assert steps[1]["dst_local"][1, 0] == 0  # shard 0 arrives step 1

    def test_per_step_padding_is_tight(self):
        """Shard-aligned block-diagonal edges all arrive on step 0; later
        steps must pad to a single slot, not to the global bucket max."""
        from shift_gcn_tpu.parallel.edge_partition import (
            partition_edges_ring)

        graph = NTU_RGB_D
        edges, n_nodes = self._block_diagonal(8, graph)  # 8 clips
        steps, v_pad, v_loc = partition_edges_ring(edges, 4, n_nodes)
        # clips per shard = 2 (25*8 nodes, v_loc = 50)
        assert steps[0]["weight"].shape[1] >= len(edges["src"]) // 4
        for r in range(1, 4):
            assert steps[r]["weight"].shape[1] == 1
            assert float(np.abs(steps[r]["weight"]).sum()) == 0.0


class TestEdgeShardedSTGCN:
    """North-star integration: the stgcn family trained with its graph
    aggregation edge-partitioned over the 'model' mesh axis matches the
    unsharded dense train step."""

    def _setup(self):
        from shift_gcn_tpu.models import stgcn
        from shift_gcn_tpu.train.optim import build_weight_decay_tree
        from shift_gcn_tpu.train.state import create_train_state

        config = stgcn.STGCNConfig(
            num_class=2, num_point=25, num_person=1, graph="ntu_rgb_d",
            channels=(8, 16), strides=(1, 2))
        state = create_train_state(
            jax.random.key(0), config, init_fn=stgcn.init_params)
        wd = build_weight_decay_tree(state.params)
        rng = np.random.default_rng(7)
        batch = {
            "data": rng.standard_normal((8, 3, 16, 25, 1)).astype(np.float32),
            "label": rng.integers(0, 2, 8).astype(np.int32),
        }
        return config, state, wd, batch

    @pytest.mark.parametrize("adaptive", [True, False])
    def test_matches_dense_train_step(self, adaptive):
        import dataclasses

        from shift_gcn_tpu.models import stgcn
        from shift_gcn_tpu.parallel import mesh as mesh_lib
        from shift_gcn_tpu.parallel.edge_partition import (
            make_edge_sharded_train_step)
        from shift_gcn_tpu.train.state import (
            create_train_state, make_train_step)
        from shift_gcn_tpu.train.optim import build_weight_decay_tree

        config, state, wd, batch = self._setup()
        config = dataclasses.replace(config, adaptive=adaptive)
        state = create_train_state(
            jax.random.key(0), config, init_fn=stgcn.init_params)
        wd = build_weight_decay_tree(state.params)
        lr = jnp.asarray(0.1, jnp.float32)

        step_ref = make_train_step(config, wd, apply_fn=stgcn.apply)
        s_ref, m_ref = jax.jit(step_ref)(state, batch, lr)

        mesh = mesh_lib.make_mesh((2, 4), devices=jax.devices()[:8])
        step_ep = make_edge_sharded_train_step(
            config, wd, mesh, batch_axis="data", edge_axis="model")
        s_ep, m_ep = jax.jit(step_ep)(state, batch, lr)

        np.testing.assert_allclose(
            float(m_ref["loss"]), float(m_ep["loss"]), atol=1e-5)
        flat_ep = dict(jax.tree_util.tree_leaves_with_path(s_ep.params))
        for path, leaf in jax.tree_util.tree_leaves_with_path(s_ref.params):
            np.testing.assert_allclose(
                np.asarray(flat_ep[path]), np.asarray(leaf), atol=3e-5,
                err_msg=jax.tree_util.keystr(path))
        for path, a in jax.tree_util.tree_leaves_with_path(s_ref.bn_state):
            b = dict(jax.tree_util.tree_leaves_with_path(
                s_ep.bn_state))[path]
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), atol=3e-5,
                err_msg=jax.tree_util.keystr(path))


class TestSDDMM:
    """Oracle tests for the adaptive-adjacency score op (ops/aggregate.py)."""

    def _edges(self):
        g = NTU_RGB_D
        coo = g.coo()
        return {"src": jnp.asarray(coo["src"]), "dst": jnp.asarray(coo["dst"])}

    def test_sddmm_matches_numpy(self):
        from shift_gcn_tpu.ops.aggregate import sddmm

        rng = np.random.default_rng(0)
        v, c = NTU_RGB_D.num_nodes, 16
        a = rng.standard_normal((2, v, c)).astype(np.float32)
        b = rng.standard_normal((2, v, c)).astype(np.float32)
        edges = self._edges()
        got = np.asarray(sddmm(jnp.asarray(a), jnp.asarray(b), edges))
        src = np.asarray(edges["src"])
        dst = np.asarray(edges["dst"])
        want = np.einsum("nec,nec->ne", a[:, src], b[:, dst])
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_sddmm_dense_matches_edge_form(self):
        from shift_gcn_tpu.ops.aggregate import sddmm, sddmm_dense

        rng = np.random.default_rng(1)
        v, c = NTU_RGB_D.num_nodes, 8
        a = jnp.asarray(rng.standard_normal((v, c)), jnp.float32)
        b = jnp.asarray(rng.standard_normal((v, c)), jnp.float32)
        edges = self._edges()
        src = np.asarray(edges["src"])
        dst = np.asarray(edges["dst"])
        mask = np.zeros((v, v), np.float32)
        mask[src, dst] = 1.0
        dense = np.asarray(sddmm_dense(a, b, jnp.asarray(mask)))
        sparse = np.asarray(sddmm(a, b, edges))
        np.testing.assert_allclose(dense[src, dst], sparse, rtol=1e-5,
                                   atol=1e-5)
        # off-pattern entries are exactly zero
        assert float(np.abs(dense * (1 - mask)).max()) == 0.0

    def test_sddmm_closes_adaptive_adjacency_loop(self):
        """SpMM(softmaxed SDDMM scores) is differentiable end to end."""
        from shift_gcn_tpu.ops.aggregate import edge_aggregate, sddmm

        rng = np.random.default_rng(2)
        v, c = NTU_RGB_D.num_nodes, 8
        x = jnp.asarray(rng.standard_normal((1, v, c)), jnp.float32)
        proj = jnp.asarray(rng.standard_normal((c, c)) * 0.1, jnp.float32)
        edges = self._edges()

        def loss(proj):
            a = x @ proj
            scores = sddmm(a, x, edges)[0]
            w = jax.nn.softmax(scores)
            e = dict(edges, weight=w)
            out = edge_aggregate(x, e, v)
            return jnp.sum(out ** 2)

        g = jax.grad(loss)(proj)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).max()) > 0.0
