"""Lowering/fusion selection as explicit config (ops/lowering.py).

Covers the VERDICT r3 task: the SGT_* env vars promoted into
ModelConfig/ExperimentConfig fields with env kept as a probe override —
precedence default < config < env — plus the load-bearing property the
env mechanism could never provide: two models with DIFFERENT lowerings
coexisting in one process, each jitted step pinned to its own config
(lowering rides the hashable ModelConfig, not ambient state).
"""

import dataclasses
import re

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from shift_gcn_tpu.ops import lowering as low_lib
from shift_gcn_tpu.ops.lowering import Lowering


_ALL_VARS = [var for var, _ in low_lib._ENV.values()]


@pytest.fixture(autouse=True)
def _clean_env(monkeypatch):
    for var in _ALL_VARS:
        monkeypatch.delenv(var, raising=False)
    yield


class TestResolutionPrecedence:
    def test_defaults(self):
        low = low_lib.resolve()
        assert low.tshift_impl == "dft"
        assert low.sgcn_impl == "dft"
        assert low.tcn_freq_fuse == "eval"
        assert low.max_shift == 8
        assert low.xpos_zero and not low.exact_xpos
        assert low.bn_lp_eval and not low.bn_lp

    def test_config_beats_default(self):
        low = low_lib.resolve(Lowering(tshift_impl="conv", max_shift=4))
        assert low.tshift_impl == "conv"
        assert low.max_shift == 4
        assert low.sgcn_impl == "dft"  # untouched fields keep defaults

    def test_env_beats_config(self, monkeypatch):
        monkeypatch.setenv("SGT_TSHIFT_IMPL", "matmul")
        monkeypatch.setenv("SGT_BN_LP_EVAL", "0")
        low = low_lib.resolve(Lowering(tshift_impl="conv"))
        assert low.tshift_impl == "matmul"
        assert low.bn_lp_eval is False
        # non-overridden fields keep the config value
        low2 = low_lib.resolve(Lowering(sgcn_impl="chain",
                                        tshift_impl="conv"))
        assert low2.sgcn_impl == "chain"
        assert low2.tshift_impl == "matmul"

    def test_env_bool_semantics_match_history(self, monkeypatch):
        # SGT_TCN_FUSE historically enabled only on "1";
        # SGT_BN_LP_EVAL disabled only on "0"
        monkeypatch.setenv("SGT_TCN_FUSE", "true")
        assert low_lib.resolve().tcn_fuse is False
        monkeypatch.setenv("SGT_TCN_FUSE", "1")
        assert low_lib.resolve().tcn_fuse is True
        monkeypatch.setenv("SGT_BN_LP_EVAL", "whatever")
        assert low_lib.resolve().bn_lp_eval is True
        monkeypatch.setenv("SGT_BN_LP_EVAL", "0")
        assert low_lib.resolve().bn_lp_eval is False

    def test_from_dict_rejects_unknown_keys(self):
        with pytest.raises(KeyError, match="WRONG ARG"):
            low_lib.from_dict({"tshift_imp": "conv"})

    def test_validate_rejects_unknown_impl(self):
        with pytest.raises(ValueError, match="tshift_impl"):
            low_lib.from_dict({"tshift_impl": "cudnn"})
        with pytest.raises(ValueError, match="max_shift"):
            low_lib.from_dict({"max_shift": 0})

    def test_programmatic_construction_validates(self):
        # direct construction (ModelConfig(lowering=Lowering(...))) must
        # validate too — not only the from_dict/YAML path (advisor r4)
        with pytest.raises(ValueError, match="tshift_impl"):
            Lowering(tshift_impl="dtf")
        with pytest.raises(ValueError, match="sgcn_impl"):
            dataclasses.replace(Lowering(), sgcn_impl="fft")
        with pytest.raises(ValueError, match="max_shift"):
            Lowering(max_shift=0)

    def test_from_dict_coerces_yaml_types(self):
        low = low_lib.from_dict(
            {"tcn_fuse": True, "max_shift": 4, "tcn_freq_fuse": 1})
        assert low.tcn_fuse is True
        assert low.max_shift == 4
        assert low.tcn_freq_fuse == "1"

    def test_from_dict_string_booleans_keep_their_meaning(self):
        # quoted YAML like `bn_lp: "0"` must DISABLE, not bool("0")->True
        low = low_lib.from_dict({"bn_lp": "0", "tcn_fuse": "true",
                                 "bn_lp_eval": "false"})
        assert low.bn_lp is False
        assert low.tcn_fuse is True
        assert low.bn_lp_eval is False
        with pytest.raises(ValueError, match="not a boolean"):
            low_lib.from_dict({"tcn_fuse": "maybe"})


def _tiny_model(lowering=None):
    from shift_gcn_tpu.models.shift_gcn import (BlockSpec, ModelConfig,
                                                init_params)

    cfg = ModelConfig(
        num_class=2, num_point=25, num_person=1, graph="ntu_rgb_d",
        blocks=(BlockSpec(3, 8, residual=False),
                BlockSpec(8, 16, stride=2)),
        lowering=lowering)
    params, state = init_params(jax.random.key(0), cfg)
    return cfg, params, state


class TestTwoModelsOneProcess:
    """The property env vars could never provide: per-model lowering."""

    def _grouped_conv_counts(self, text):
        return [int(g) for g in re.findall(
            r"feature_group_count\s*=\s*(\d+)", text) if int(g) > 1]

    def test_dispatch_is_per_config_not_ambient(self):
        from shift_gcn_tpu.models import shift_gcn

        cfg_conv, params, state = _tiny_model(
            Lowering(tshift_impl="conv", sgcn_impl="chain"))
        cfg_dft, _, _ = _tiny_model(None)  # defaults: dft everywhere
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((2, 3, 64, 25, 1)), jnp.float32)

        def make(cfg):
            return jax.jit(lambda p, s, xx: shift_gcn.apply(
                p, s, xx, cfg, training=False)[0])

        f_conv, f_dft = make(cfg_conv), make(cfg_dft)
        # the conv-lowered model compiles the depthwise (grouped) tap
        # conv; the dft-lowered model has no grouped conv anywhere
        conv_text = f_conv.lower(params, state, x).as_text()
        dft_text = f_dft.lower(params, state, x).as_text()
        assert self._grouped_conv_counts(conv_text), (
            "conv lowering must emit a feature-grouped depthwise conv")
        assert not self._grouped_conv_counts(dft_text), (
            "dft lowering must not emit grouped convs")

        # both lowerings are the same math: interleaved execution in ONE
        # process agrees to fp tolerance
        out_conv = np.asarray(f_conv(params, state, x))
        out_dft = np.asarray(f_dft(params, state, x))
        np.testing.assert_allclose(out_conv, out_dft, rtol=2e-4, atol=2e-4)

    def test_training_grads_per_config(self):
        """Both models' jitted grads run in one process; ypos constraint
        steps (exactly +-0.01/1e-4) are identical across lowerings."""
        from shift_gcn_tpu.models import shift_gcn

        cfg_a, params, state = _tiny_model(
            Lowering(tshift_impl="conv", sgcn_impl="circconv"))
        cfg_b, _, _ = _tiny_model(Lowering(tshift_impl="matmul"))
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((2, 3, 32, 25, 1)), jnp.float32)
        y = jnp.asarray([0, 1])

        def make_grad(cfg):
            def loss(p, s, xx):
                logits, _ = shift_gcn.apply(p, s, xx, cfg, training=True)
                return jnp.mean(
                    -jax.nn.log_softmax(logits)[jnp.arange(2), y])
            return jax.jit(jax.grad(loss))

        ga = make_grad(cfg_a)(params, state, x)
        gb = make_grad(cfg_b)(params, state, x)
        ga_ypos = np.asarray(ga["l1"]["tcn1"]["shift_in"]["ypos"])
        gb_ypos = np.asarray(gb["l1"]["tcn1"]["shift_in"]["ypos"])
        np.testing.assert_allclose(np.abs(ga_ypos), 0.01, atol=1e-8)
        np.testing.assert_array_equal(ga_ypos, gb_ypos)
        np.testing.assert_allclose(
            np.asarray(ga["l1"]["gcn1"]["Linear_weight"]),
            np.asarray(gb["l1"]["gcn1"]["Linear_weight"]),
            rtol=3e-4, atol=3e-5)

    def test_env_still_overrides_config_at_trace(self, monkeypatch):
        """A set SGT_* var beats the config field (probe escape hatch)."""
        from shift_gcn_tpu.models import shift_gcn

        cfg, params, state = _tiny_model(Lowering(tshift_impl="conv"))
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.standard_normal((1, 3, 32, 25, 1)), jnp.float32)
        monkeypatch.setenv("SGT_TSHIFT_IMPL", "dft")
        f = jax.jit(lambda p, s, xx: shift_gcn.apply(
            p, s, xx, cfg, training=False)[0])
        text = f.lower(params, state, x).as_text()
        assert not [int(g) for g in re.findall(
            r"feature_group_count\s*=\s*(\d+)", text) if int(g) > 1]


class TestOpLevelExplicitLowering:
    def test_temporal_shift_explicit_low_matches_env(self, monkeypatch):
        from shift_gcn_tpu.ops.temporal_shift import temporal_shift

        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.standard_normal((2, 16, 5, 6)), jnp.float32)
        xpos = jnp.zeros(6)
        ypos = jnp.asarray(rng.uniform(-2, 2, 6), jnp.float32)

        explicit = np.asarray(temporal_shift(
            x, xpos, ypos, 1, Lowering(tshift_impl="conv", max_shift=4)))
        monkeypatch.setenv("SGT_TSHIFT_IMPL", "conv")
        monkeypatch.setenv("SGT_MAX_SHIFT", "4")
        via_env = np.asarray(temporal_shift(x, xpos, ypos, 1))
        np.testing.assert_array_equal(explicit, via_env)

    def test_max_shift_radii_agree_within_range(self):
        # any radius >= |ypos| is exact: 4 vs 8 must agree bit-for-math
        from shift_gcn_tpu.ops.temporal_shift import temporal_shift

        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.standard_normal((2, 20, 3, 4)), jnp.float32)
        ypos = jnp.asarray(rng.uniform(-3, 3, 4), jnp.float32)
        a = np.asarray(temporal_shift(
            x, jnp.zeros(4), ypos, 1, Lowering(tshift_impl="conv",
                                               max_shift=4)))
        b = np.asarray(temporal_shift(
            x, jnp.zeros(4), ypos, 1, Lowering(tshift_impl="conv",
                                               max_shift=8)))
        np.testing.assert_allclose(a, b, atol=1e-6)

    def test_batch_norm_explicit_lp(self):
        from shift_gcn_tpu.ops.batchnorm import batch_norm, init_bn

        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.standard_normal((4, 8, 3)), jnp.bfloat16)
        p, s = init_bn(3)
        lo, _ = batch_norm(x, p, s, reduce_axes=(0, 1), training=False,
                           lp=True)
        hi, _ = batch_norm(x, p, s, reduce_axes=(0, 1), training=False,
                           lp=False)
        # same math within bf16 rounding; both bf16 out
        assert lo.dtype == jnp.bfloat16 and hi.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(lo, np.float32), np.asarray(hi, np.float32),
            rtol=2e-2, atol=2e-2)

    def test_assert_in_range_uses_explicit_radius(self):
        from shift_gcn_tpu.ops.temporal_shift import assert_in_range

        ypos = np.full(4, 5.0, np.float32)
        assert_in_range(ypos, max_shift=8)
        with pytest.raises(ValueError, match="max_shift"):
            assert_in_range(ypos, max_shift=4)


class TestTrainerIntegration:
    def test_snapshot_records_resolved_lowering(self, tmp_path):
        import yaml

        from test_training import _write_synthetic_dataset
        from shift_gcn_tpu.train.config import ExperimentConfig
        from shift_gcn_tpu.train.trainer import Trainer

        data_path, label_path = _write_synthetic_dataset(tmp_path)
        cfg = ExperimentConfig(
            Experiment_name="lowering_snapshot",
            work_dir=str(tmp_path / "work_dir"),
            model_saved_name=str(tmp_path / "save_models"),
            train_feeder_args={"data_path": data_path,
                               "label_path": label_path},
            test_feeder_args={"data_path": data_path,
                              "label_path": label_path},
            model_args={"num_class": 2, "num_point": 25, "num_person": 1},
            batch_size=8, test_batch_size=8, num_epoch=1,
            lowering={"tshift_impl": "conv", "max_shift": 4},
        )
        tr = Trainer(cfg)
        # the model config carries the resolved selection (static piece
        # of the jitted steps)
        assert tr.model_config.lowering.tshift_impl == "conv"
        assert tr.model_config.lowering.max_shift == 4
        assert tr.model_config.lowering.sgcn_impl == "dft"
        # the work-dir snapshot records the FULL resolved dict, so the
        # run is self-describing
        with open(tmp_path / "work_dir" / "lowering_snapshot"
                  / "config.yaml") as f:
            snap = yaml.safe_load(f)
        assert snap["lowering"] == dataclasses.asdict(
            tr.model_config.lowering)
        assert snap["lowering"]["tcn_freq_fuse"] == "eval"

    def test_yaml_lowering_key_parses(self, tmp_path):
        from shift_gcn_tpu.train.config import load_config

        cfg_file = tmp_path / "c.yaml"
        cfg_file.write_text(
            "Experiment_name: t\nlowering:\n  tshift_impl: matmul\n")
        cfg = load_config(["--config", str(cfg_file)])
        assert cfg.lowering == {"tshift_impl": "matmul"}

    def test_family_without_lowering_surface_rejects_explicit_keys(
            self, tmp_path):
        """A configured lowering a family cannot honor is an error with
        a clear message — never a silent no-op with a false snapshot
        (code-review r4)."""
        import yaml

        from test_training import _write_synthetic_dataset
        from shift_gcn_tpu.train.config import ExperimentConfig
        from shift_gcn_tpu.train.trainer import Trainer

        data_path, label_path = _write_synthetic_dataset(tmp_path)

        def cfg(**kw):
            return ExperimentConfig(
                Experiment_name="nolow",
                work_dir=str(tmp_path / "work"),
                model_saved_name=str(tmp_path / "save"),
                model="shift_gcn_tpu.models.stgcn",
                model_args={"num_class": 2, "num_point": 25,
                            "num_person": 1},
                train_feeder_args={"data_path": data_path,
                                   "label_path": label_path},
                test_feeder_args={"data_path": data_path,
                                  "label_path": label_path},
                batch_size=8, test_batch_size=8, **kw)

        with pytest.raises(ValueError, match="no lowering surface"):
            Trainer(cfg(lowering={"bn_lp_eval": False}))
        # without explicit keys the family builds fine and the snapshot
        # honestly records NO config-pinned lowering
        tr = Trainer(cfg())
        with open(tmp_path / "work" / "nolow" / "config.yaml") as f:
            snap = yaml.safe_load(f)
        assert snap["lowering"] == {}
        assert not hasattr(tr.model_config, "lowering")
