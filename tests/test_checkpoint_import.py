"""Reference (torch) checkpoint import: a synthetic state_dict with the
reference's exact key names — including the 'module.' DataParallel prefix
and the Sequential 'down.0'/'down.1' indices — must load into our pytrees
and reproduce the torch oracle's logits.

Reference contract: main.py:261-292 (weights load with 'module.' strip,
ignore list, partial update); checkpoint dict format main.py:436-448.
"""

import os
import pickle

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from shift_gcn_tpu.models.shift_gcn import (
    BlockSpec, ModelConfig, apply, init_params)
from shift_gcn_tpu.utils.checkpoint import (
    load_reference_checkpoint, torch_state_dict_to_pytrees)

from test_model_parity import _torch_forward


_BN_KEYS = ("weight", "bias", "running_mean", "running_var",
            "num_batches_tracked")


def _config():
    return ModelConfig(
        num_class=4, num_point=25, num_person=1, graph="ntu_rgb_d",
        blocks=(
            BlockSpec(3, 8, residual=False),
            BlockSpec(8, 12, stride=2),   # covers gcn down + residual tcn
        ))


def _reference_state_dict(config, seed=0):
    """Torch state_dict with the reference module's key names, random
    values, shaped to match our init (which stores torch shapes)."""
    params, bn_state = init_params(jax.random.key(3), config)
    rng = np.random.default_rng(seed)
    sd = {}

    def emit(tree, prefix):
        for k, v in tree.items():
            if isinstance(v, dict):
                emit(v, prefix + [k])
                continue
            parts = prefix + [k]
            # our pytree down.conv/down.bn came from the reference's
            # nn.Sequential indices (model/shift_gcn.py:82-88)
            parts = ["0" if p == "conv" and "down" in prefix
                     else "1" if p == "bn" and "down" in prefix
                     else p for p in parts]
            name = ".".join(parts)
            arr = np.asarray(v)
            if k == "num_batches_tracked":
                sd[name] = torch.as_tensor(np.asarray(7, np.int64))
            elif k == "running_var":
                sd[name] = torch.as_tensor(
                    (1.0 + rng.random(arr.shape)).astype(np.float32))
            elif k in ("xpos",):
                sd[name] = torch.as_tensor(
                    rng.uniform(-1e-8, 1e-8, arr.shape).astype(np.float32))
            else:
                sd[name] = torch.as_tensor(
                    (rng.standard_normal(arr.shape) * 0.2).astype(
                        np.float32))
    emit(params, [])
    emit(bn_state, [])
    return sd


class TestStateDictTranslation:
    def test_roundtrip_reproduces_torch_oracle_logits(self, tmp_path):
        config = _config()
        sd = _reference_state_dict(config)
        # reference checkpoints carry the DataParallel 'module.' prefix
        # (main.py:271-273 strips it)
        blob = {
            "model_state_dict": {"module." + k: v for k, v in sd.items()},
            "epoch": 41, "global_step": 1234, "best_acc": 0.99,
        }
        path = os.path.join(tmp_path, "ref-41-1234.pt")
        torch.save(blob, path)

        params, bn_state, meta = load_reference_checkpoint(path)
        assert meta["epoch"] == 41 and meta["global_step"] == 1234

        # structure must exactly match our init pytrees
        init_p, init_s = init_params(jax.random.key(0), config)
        assert (jax.tree_util.tree_structure(params)
                == jax.tree_util.tree_structure(init_p))
        assert (jax.tree_util.tree_structure(bn_state)
                == jax.tree_util.tree_structure(init_s))
        for (pa, a), (pb, b) in zip(
                jax.tree_util.tree_leaves_with_path(params),
                jax.tree_util.tree_leaves_with_path(init_p)):
            assert pa == pb and a.shape == b.shape, (pa, a.shape, b.shape)

        # Sequential index translation: down.0 -> conv (4D), down.1 -> bn
        down = params["l2"]["gcn1"]["down"]
        assert down["conv"]["weight"].ndim == 4
        assert down["bn"]["weight"].ndim == 1
        assert "running_mean" in bn_state["l2"]["gcn1"]["down"]["bn"]

        # imported weights drive our apply to the torch oracle's logits
        x = np.random.default_rng(1).standard_normal(
            (2, 3, 12, 25, 1)).astype(np.float32)
        jp = jax.tree_util.tree_map(jnp.asarray, params)
        js = jax.tree_util.tree_map(jnp.asarray, bn_state)
        got, _ = apply(jp, js, jnp.asarray(x), config, training=False)
        want = _torch_forward(params, bn_state, x, config.blocks,
                              config.num_person, training=False)
        np.testing.assert_allclose(
            np.asarray(got), want.numpy(), atol=2e-4, rtol=1e-3)

    def test_pkl_weights_load(self, tmp_path):
        """Reference .pkl weights path (main.py:264-266)."""
        config = _config()
        sd = {k: v.numpy() for k, v in _reference_state_dict(config).items()}
        path = os.path.join(tmp_path, "weights.pkl")
        with open(path, "wb") as f:
            pickle.dump(sd, f)
        params, bn_state, meta = load_reference_checkpoint(path)
        assert meta == {}
        assert params["fc"]["weight"].shape == (4, 12)

    def test_trainer_loads_reference_weights(self, tmp_path):
        """Trainer(cfg with weights=<ref .pt>) merges the imported tensors
        into the train state (main.py:261-292 parity), honoring
        ignore_weights."""
        from test_training import _write_synthetic_dataset

        from shift_gcn_tpu.train.config import ExperimentConfig
        from shift_gcn_tpu.train.trainer import Trainer

        config = _config()
        sd = _reference_state_dict(config, seed=5)
        path = os.path.join(tmp_path, "ref-10-99.pt")
        torch.save({"model_state_dict": sd}, path)

        data_path, label_path = _write_synthetic_dataset(tmp_path, n=8, t=12)
        cfg = ExperimentConfig(
            Experiment_name="import_smoke",
            work_dir=str(tmp_path / "work_dir"),
            model_saved_name=str(tmp_path / "save_models"),
            train_feeder_args={"data_path": data_path,
                               "label_path": label_path},
            test_feeder_args={"data_path": data_path,
                              "label_path": label_path},
            model_args={"num_class": 4, "num_point": 25, "num_person": 1,
                        "graph": "ntu_rgb_d",
                        "blocks": [[3, 8, 1, 0], [8, 12, 2, 1]]},
            batch_size=8, test_batch_size=8, num_epoch=1,
            weights=path, ignore_weights=["fc"], device_guard=False)
        tr = Trainer(cfg)
        # non-ignored weights equal the checkpoint...
        np.testing.assert_allclose(
            np.asarray(tr.state.params["l1"]["gcn1"]["Linear_weight"]),
            sd["l1.gcn1.Linear_weight"].numpy())
        np.testing.assert_allclose(
            np.asarray(tr.state.bn_state["l2"]["tcn1"]["bn"]["running_mean"]),
            sd["l2.tcn1.bn.running_mean"].numpy())
        # ...while the ignored fc stays at our init (not the checkpoint's)
        assert not np.allclose(
            np.asarray(tr.state.params["fc"]["weight"]),
            sd["fc.weight"].numpy())


class TestTorchExport:
    """Export to the reference .pt format (the inverse of import): a user
    can take weights trained here back to the reference codebase
    (main.py --weights / resume formats)."""

    def _trees(self):
        import jax

        from shift_gcn_tpu.models.shift_gcn import init_params

        config = _config()
        params, bn_state = init_params(jax.random.key(5), config)
        pn = jax.tree_util.tree_map(np.asarray, params)
        sn = jax.tree_util.tree_map(np.asarray, bn_state)
        return config, pn, sn

    def test_state_dict_uses_reference_naming(self):
        from shift_gcn_tpu.utils.checkpoint import (
            pytrees_to_torch_state_dict)

        config, pn, sn = self._trees()
        sd = pytrees_to_torch_state_dict(pn, sn)
        # Sequential indices for the gcn down path, not conv/bn names
        down_keys = [k for k in sd if ".down." in k]
        assert down_keys
        assert all(".down.0." in k or ".down.1." in k for k in down_keys)
        # the reference's non-trainable shift index buffers are present
        # and match the flat-index rule (model/shift_gcn.py:108-118)
        v = config.num_point
        for i, spec in enumerate(config.blocks):
            cin = spec.in_channels
            idx = sd[f"l{i + 1}.gcn1.shift_in"]
            want = np.array(
                [(a * cin + b + b * cin) % (cin * v)
                 for a in range(v) for b in range(cin)], dtype=np.int64)
            np.testing.assert_array_equal(idx, want)
        assert sd["data_bn.num_batches_tracked"].dtype == np.int64

    def test_pt_roundtrip_is_exact(self, tmp_path):
        from shift_gcn_tpu.utils.checkpoint import (
            export_reference_checkpoint, load_reference_checkpoint)

        _, pn, sn = self._trees()
        path = str(tmp_path / "export.pt")
        export_reference_checkpoint(
            path, pn, sn, meta={"epoch": 7, "global_step": 99,
                                "best_acc": 0.5})
        params2, bn2, meta = load_reference_checkpoint(path)
        assert meta == {"epoch": 7, "global_step": 99, "best_acc": 0.5}

        def flat(tree, prefix=""):
            for k, v in tree.items():
                if isinstance(v, dict):
                    yield from flat(v, f"{prefix}{k}.")
                else:
                    yield prefix + k, np.asarray(v)

        re_p = dict(flat(params2))
        for name, val in flat(pn):
            np.testing.assert_array_equal(re_p[name], val, err_msg=name)
        re_s = dict(flat(bn2))
        for name, val in flat(sn):
            got = re_s[name]
            if name.endswith("num_batches_tracked"):
                got = got.astype(np.int32)
            np.testing.assert_array_equal(got, val, err_msg=name)

    def test_bare_state_dict_flavor_loads_as_weights(self, tmp_path):
        """Without meta the file is a bare state_dict (the reference's
        --weights format) and our own Trainer weight-import path accepts
        it too."""
        import torch

        from shift_gcn_tpu.utils.checkpoint import (
            export_reference_checkpoint, load_reference_checkpoint)

        _, pn, sn = self._trees()
        path = str(tmp_path / "weights.pt")
        export_reference_checkpoint(path, pn, sn)
        blob = torch.load(path, map_location="cpu", weights_only=False)
        assert "model_state_dict" not in blob
        assert "l1.gcn1.Linear_weight" in blob
        params2, _, meta = load_reference_checkpoint(path)
        assert meta == {}
        np.testing.assert_array_equal(
            np.asarray(params2["fc"]["weight"]),
            np.asarray(pn["fc"]["weight"]))
