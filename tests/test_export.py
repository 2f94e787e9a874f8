"""AOT serving export (inference/export.py): serialized StableHLO
artifacts reproduce the live eval forward exactly."""

import pytest

import numpy as np

import jax
import jax.numpy as jnp

from shift_gcn_tpu.inference import export as export_lib
from shift_gcn_tpu.models.shift_gcn import (
    BlockSpec, ModelConfig, apply, init_params)


def _cfg():
    return ModelConfig(
        num_class=2, num_point=25, num_person=1, graph="ntu_rgb_d",
        blocks=(BlockSpec(3, 8, residual=False),
                BlockSpec(8, 16, stride=2)))


def test_baked_export_roundtrip_matches_live_forward(tmp_path):
    cfg = _cfg()
    params, bn_state = init_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 3, 16, 25, 1)), jnp.float32)

    blob = export_lib.export_eval_baked(params, bn_state, cfg,
                                        batch_size=4, seq_len=16)
    assert isinstance(blob, bytes) and len(blob) > 0
    art = export_lib.load_exported(blob)
    got = np.asarray(art.call(x))
    want, _ = apply(params, bn_state, x, cfg, training=False)
    np.testing.assert_allclose(got, np.asarray(want), atol=1e-5)


def test_weights_as_inputs_export_hot_swaps_checkpoints():
    cfg = _cfg()
    p1, s1 = init_params(jax.random.key(1), cfg)
    p2, s2 = init_params(jax.random.key(2), cfg)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 3, 16, 25, 1)), jnp.float32)

    blob = export_lib.export_eval(p1, s1, cfg, batch_size=2, seq_len=16)
    art = export_lib.load_exported(blob)
    for p, s in ((p1, s1), (p2, s2)):
        got = np.asarray(art.call(p, s, x))
        want, _ = apply(p, s, x, cfg, training=False)
        np.testing.assert_allclose(got, np.asarray(want), atol=1e-5)


def test_serve_cli_scores_clips(tmp_path):
    """export -> serve: batch scoring (incl. padded tail) matches the live
    forward."""
    from shift_gcn_tpu.inference import serve as serve_lib

    cfg = _cfg()
    params, bn_state = init_params(jax.random.key(4), cfg)
    blob = export_lib.export_eval_baked(params, bn_state, cfg,
                                        batch_size=4, seq_len=16)
    art_path = tmp_path / "model.shlo"
    art_path.write_bytes(blob)
    rng = np.random.default_rng(3)
    data = rng.standard_normal((10, 3, 16, 25, 1)).astype(np.float32)
    np.save(tmp_path / "clips.npy", data)
    serve_lib.main(["--artifact", str(art_path),
                    "--data", str(tmp_path / "clips.npy"),
                    "--out", str(tmp_path / "scores.npy"),
                    "--batch-size", "4"])
    got = np.load(tmp_path / "scores.npy")
    want, _ = apply(params, bn_state, jnp.asarray(data), cfg,
                    training=False)
    np.testing.assert_allclose(got, np.asarray(want), atol=1e-5)


def test_export_checkpoint_cli_path(tmp_path):
    """export_checkpoint reads a saved run dir and writes the artifact."""
    from shift_gcn_tpu.train.state import create_train_state
    from shift_gcn_tpu.utils import checkpoint as ckpt_lib

    cfg = _cfg()
    state = create_train_state(jax.random.key(3), cfg)
    payload = {
        "params": state.params, "bn_state": state.bn_state,
        "opt_state": state.opt_state, "global_step": state.global_step,
        "meta": {"epoch": 0, "best_acc": 0.0},
    }
    save_dir = str(tmp_path / "save")
    ckpt_lib.save_checkpoint(save_dir, 0, payload)
    out = export_lib.export_checkpoint(
        save_dir, str(tmp_path / "model.shlo"), config=cfg,
        batch_size=2, seq_len=16)
    blob = open(out, "rb").read()
    art = export_lib.load_exported(blob)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 3, 16, 25, 1)), jnp.float32)
    want, _ = apply(state.params, state.bn_state, x, cfg, training=False)
    # default flavor is params-as-inputs (the recommended, faster one)
    np.testing.assert_allclose(
        np.asarray(art.call(state.params, state.bn_state, x)),
        np.asarray(want), atol=1e-5)
    # baked opt-in still produces the self-contained (x-only) artifact
    out_b = export_lib.export_checkpoint(
        save_dir, str(tmp_path / "model_baked.shlo"), config=cfg,
        batch_size=2, seq_len=16, baked=True)
    art_b = export_lib.load_exported(open(out_b, "rb").read())
    np.testing.assert_allclose(np.asarray(art_b.call(x)),
                               np.asarray(want), atol=1e-5)


def test_serve_inputs_flavor_and_baked_detection():
    from shift_gcn_tpu.inference import serve as serve_lib

    config = _cfg()
    params, state = init_params(jax.random.key(0), config)
    rng = np.random.default_rng(0)
    data = rng.standard_normal((5, 3, 16, config.num_point, 1)).astype(
        np.float32)

    blob_i = export_lib.export_eval(params, state, config, 2, 16)
    blob_b = export_lib.export_eval_baked(params, state, config, 2, 16)
    art_i = export_lib.load_exported(blob_i)
    art_b = export_lib.load_exported(blob_b)
    assert not serve_lib.artifact_is_baked(art_i)
    assert serve_lib.artifact_is_baked(art_b)

    # inputs flavor scores with runtime weights; matches the baked one
    got_i = serve_lib.score_clips(art_i, data, 2, weights=(params, state))
    got_b = serve_lib.score_clips(art_b, data, 2)
    assert got_i.shape == (5, config.num_class)
    np.testing.assert_allclose(got_i, got_b, atol=1e-5)


def test_restore_weights_for_artifact_any_architecture(tmp_path):
    """The inputs-flavor serving path restores weights using the
    artifact's own avals as the template — no model config needed, so a
    non-default architecture round-trips through serve.score_clips."""
    from shift_gcn_tpu.inference import serve as serve_lib
    from shift_gcn_tpu.train.state import create_train_state
    from shift_gcn_tpu.utils import checkpoint as ckpt_lib

    # deliberately NOT the default mediapipe config
    cfg = ModelConfig(
        num_class=5, num_point=25, num_person=2, graph="ntu_rgb_d",
        blocks=(BlockSpec(3, 8, residual=False),
                BlockSpec(8, 16, stride=2)))
    state = create_train_state(jax.random.key(7), cfg)
    save_dir = str(tmp_path / "save")
    ckpt_lib.save_checkpoint(save_dir, 0, {
        "params": state.params, "bn_state": state.bn_state,
        "opt_state": state.opt_state, "global_step": state.global_step,
        "meta": {"epoch": 0, "best_acc": 0.0},
    })

    blob = export_lib.export_eval(state.params, state.bn_state, cfg,
                                  batch_size=2, seq_len=16)
    art = export_lib.load_exported(blob)
    params, bn_state = export_lib.restore_weights_for_artifact(
        save_dir, art)

    rng = np.random.default_rng(3)
    data = rng.standard_normal((3, 3, 16, 25, 2)).astype(np.float32)
    got = serve_lib.score_clips(art, data, 2, weights=(params, bn_state))
    want, _ = apply(state.params, state.bn_state, jnp.asarray(data), cfg,
                    training=False)
    np.testing.assert_allclose(got, np.asarray(want), atol=1e-5)

    # baked artifacts refuse the weights path loudly
    baked = export_lib.load_exported(export_lib.export_eval_baked(
        state.params, state.bn_state, cfg, 2, 16))
    with pytest.raises(ValueError, match="baked"):
        export_lib.restore_weights_for_artifact(save_dir, baked)
