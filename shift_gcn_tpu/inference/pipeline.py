"""End-to-end video fall-detection inference pipeline.

TPU-native rebuild of reference inference_pipeline.py:574-670: video ->
pose landmarks -> pre-normalized sliding windows -> on-the-fly 4-modality
derivation -> 4-model ensembled logits -> per-frame score aggregation ->
threshold interval detection -> JSON report (optional annotated video).

Differences by design:
- pose extraction goes through the pluggable PoseBackend (MediaPipe is
  optional; raw landmark arrays can be fed directly via `run_on_landmarks`),
- all windows and all four modalities are batched into ONE jitted forward
  per model (the reference loops windows/modalities in Python per forward),
- model weights are Orbax checkpoints (reference .pt auto-import supported).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from shift_gcn_tpu.data.modalities import derive_modalities
from shift_gcn_tpu.data.preprocess import pre_normalization
from shift_gcn_tpu.graphs import get_graph
from shift_gcn_tpu.models.shift_gcn import ModelConfig

MODALITY_ORDER = ("joint", "bone", "joint_motion", "bone_motion")
DEFAULT_ALPHA = (0.6, 0.6, 0.4, 0.4)


def create_sliding_windows(
    data: np.ndarray, window: int = 300, stride: int = 150
) -> Tuple[np.ndarray, List[Tuple[int, int]]]:
    """(C, T, V, M) raw sequence -> stacked zero-padded windows + spans.

    Matches reference inference_pipeline.py:252-281: windows start every
    `stride` frames; a final short window is zero-padded; sequences shorter
    than `window` yield a single padded window.
    """
    c, t, v, m = data.shape
    starts = list(range(0, max(t - window, 0) + 1, stride))
    if not starts:
        starts = [0]
    elif starts[-1] + window < t:
        starts.append(t - window)
    windows = []
    spans = []
    for s in starts:
        w = np.zeros((c, window, v, m), dtype=np.float32)
        seg = data[:, s:s + window]
        w[:, :seg.shape[1]] = seg
        windows.append(w)
        spans.append((s, min(s + window, t)))
    return np.stack(windows), spans


def aggregate_per_frame(
    window_scores: np.ndarray, spans: Sequence[Tuple[int, int]],
    total_frames: int
) -> np.ndarray:
    """Average overlapping window probabilities into per-frame scores
    (reference: inference_pipeline.py:377-386)."""
    acc = np.zeros(total_frames, dtype=np.float64)
    cnt = np.zeros(total_frames, dtype=np.float64)
    for p, (s, e) in zip(window_scores, spans):
        acc[s:e] += p
        cnt[s:e] += 1
    return np.where(cnt > 0, acc / np.maximum(cnt, 1), 0.0)


@dataclasses.dataclass
class FallInterval:
    start_frame: int
    end_frame: int
    peak_prob: float
    mean_prob: float


def detect_fall_intervals(
    frame_probs: np.ndarray, threshold: float = 0.5,
    min_length: int = 1
) -> List[FallInterval]:
    """Threshold-crossing regions with peak statistics
    (reference: inference_pipeline.py:389-424)."""
    above = frame_probs >= threshold
    intervals: List[FallInterval] = []
    start = None
    for i, flag in enumerate(above):
        if flag and start is None:
            start = i
        elif not flag and start is not None:
            if i - start >= min_length:
                seg = frame_probs[start:i]
                intervals.append(FallInterval(
                    start, i - 1, float(seg.max()), float(seg.mean())))
            start = None
    if start is not None and len(above) - start >= min_length:
        seg = frame_probs[start:]
        intervals.append(FallInterval(
            start, len(above) - 1, float(seg.max()), float(seg.mean())))
    return intervals


class EnsemblePredictor:
    """Four-stream ensemble forward over batched windows."""

    def __init__(
        self,
        checkpoints: Dict[str, str],
        model_config: Optional[ModelConfig] = None,
        alpha: Sequence[float] = DEFAULT_ALPHA,
        graph: str = "mediapipe_pose",
    ):
        self.config = model_config or ModelConfig(
            num_class=2, num_point=33, num_person=1, graph=graph)
        self.graph = get_graph(self.config.graph)
        self.alpha = dict(zip(MODALITY_ORDER, alpha))
        self._models = {}
        for modality, path in checkpoints.items():
            if modality not in MODALITY_ORDER:
                raise KeyError(f"unknown modality {modality!r}")
            self._models[modality] = self._load(path)
        self._forward = jax.jit(self._forward_impl)

    @classmethod
    def from_fourstream_checkpoint(
        cls,
        path: str,
        model_config: Optional[ModelConfig] = None,
        alpha: Sequence[float] = DEFAULT_ALPHA,
        graph: str = "mediapipe_pose",
    ) -> "EnsemblePredictor":
        """Build the ensemble from ONE concurrent-fourstream checkpoint
        (train/fourstream.py stores all four models stacked on axis 0;
        stream order == MODALITY_ORDER == fourstream.STREAMS)."""
        from shift_gcn_tpu.train import fourstream as fs
        from shift_gcn_tpu.utils import checkpoint as ckpt_lib

        self = cls.__new__(cls)
        self.config = model_config or ModelConfig(
            num_class=2, num_point=33, num_person=1, graph=graph)
        self.graph = get_graph(self.config.graph)
        self.alpha = dict(zip(MODALITY_ORDER, alpha))
        state4 = fs.create_fourstream_state(jax.random.key(0), self.config)
        if os.path.isdir(path) and not os.path.basename(path).isdigit():
            latest = ckpt_lib.latest_checkpoint(path)
            if latest is None:
                raise FileNotFoundError(f"no checkpoints under {path}")
            path = latest
        template = {
            "params": state4.params, "bn_state": state4.bn_state,
            "opt_state": state4.opt_state,
            "global_step": state4.global_step,
            "meta": {"epoch": 0, "best_acc": 0.0},
        }
        payload = ckpt_lib.restore_checkpoint(path, template)
        self._models = {
            stream: (
                jax.tree_util.tree_map(lambda x, i=i: x[i],
                                       payload["params"]),
                jax.tree_util.tree_map(lambda x, i=i: x[i],
                                       payload["bn_state"]),
            )
            for i, stream in enumerate(fs.STREAMS)
        }
        self._forward = jax.jit(self._forward_impl)
        return self

    def _load(self, path: str):
        from shift_gcn_tpu.models.shift_gcn import init_params
        from shift_gcn_tpu.utils import checkpoint as ckpt_lib

        params, state = init_params(jax.random.key(0), self.config)
        if path.endswith((".pt", ".pkl", ".pth")):
            p_np, s_np, _ = ckpt_lib.load_reference_checkpoint(path)
            params = jax.tree_util.tree_map(jnp.asarray, p_np)
            state = jax.tree_util.tree_map(jnp.asarray, s_np)
        else:
            import jax.numpy as jnp2  # noqa: F401
            from shift_gcn_tpu.train.optim import init_sgd

            if os.path.isdir(path) and not os.path.basename(path).isdigit():
                latest = ckpt_lib.latest_checkpoint(path)
                if latest is None:
                    raise FileNotFoundError(f"no checkpoints under {path}")
                path = latest
            template = {
                "params": params, "bn_state": state,
                "opt_state": init_sgd(params),
                "global_step": jnp.zeros((), jnp.int32),
                "meta": {"epoch": 0, "best_acc": 0.0},
            }
            payload = ckpt_lib.restore_checkpoint(path, template)
            params, state = payload["params"], payload["bn_state"]
        return params, state

    def _forward_impl(self, models, windows_by_modality):
        from shift_gcn_tpu.models.shift_gcn import apply

        total = None
        for modality in MODALITY_ORDER:
            if modality not in models:
                continue
            params, state = models[modality]
            logits, _ = apply(params, state, windows_by_modality[modality],
                              self.config, training=False)
            weighted = logits * self.alpha[modality]
            total = weighted if total is None else total + weighted
        return jax.nn.softmax(total, axis=-1)

    def predict(self, windows: np.ndarray) -> np.ndarray:
        """windows: (W, C, T, V, M) pre-normalized joint windows ->
        (W, num_class) ensembled probabilities."""
        mods = derive_modalities(windows, self.graph)
        batch = {k: jnp.asarray(v) for k, v in mods.items()
                 if k in self._models}
        return np.asarray(self._forward(self._models, batch))


def build_report(
    window_scores: np.ndarray, spans: Sequence[Tuple[int, int]],
    total_frames: int, threshold: float
) -> Dict:
    """Window fall-scores + spans -> the report dict (reference:
    inference_pipeline.py:638-652).  Shared by the offline path below and
    the streaming detector's finalize() — the two reports must stay
    key-for-key identical (tested, tests/test_streaming.py parity)."""
    frame_probs = aggregate_per_frame(
        np.asarray(window_scores, np.float64), spans, total_frames)
    intervals = detect_fall_intervals(frame_probs, threshold)
    return {
        "total_frames": int(total_frames),
        "num_windows": int(len(spans)),
        "fall_detected": bool(intervals),
        "max_fall_probability": float(frame_probs.max())
        if total_frames else 0.0,
        "fall_intervals": [dataclasses.asdict(iv) for iv in intervals],
        "frame_probabilities": frame_probs.tolist(),
    }


def run_on_landmarks(
    landmarks: np.ndarray,
    predictor: EnsemblePredictor,
    *,
    window: int = 300,
    stride: int = 150,
    threshold: float = 0.5,
) -> Dict:
    """Landmarks (3, T, 33, 1) -> fall report dict (no video decode)."""
    total_frames = landmarks.shape[1]
    windows, spans = create_sliding_windows(landmarks, window, stride)
    batch = pre_normalization(
        windows.copy(),
        zaxis=predictor.graph.zaxis, xaxis=predictor.graph.xaxis,
        center_joint=list(predictor.graph.center_joint))
    probs = predictor.predict(batch)
    return build_report(probs[:, 1], spans, total_frames, threshold)


def auto_detect_checkpoints(save_dir: str) -> Dict[str, str]:
    """Find the newest checkpoint per modality under a save-models root
    (reference: auto_detect_checkpoint, inference_pipeline.py:28-38).

    Handles both layouts:
    - our Orbax run dirs: <save_dir>/<experiment>/<step>/ where the
      experiment name contains the modality ("joint", "bone",
      "joint_motion"/"joint-motion", ...) — the highest step wins,
    - reference torch files: <save_dir>/*_<modality>-<epoch>-<step>.pt —
      the highest epoch wins.
    """
    import glob as _glob

    from shift_gcn_tpu.utils.checkpoint import latest_checkpoint

    def has_modality(name: str, modality: str) -> bool:
        norm = name.lower().replace("-", "_")
        if modality in ("joint", "bone"):
            # plain joint/bone must not match the *_motion experiments
            return (modality in norm.split("_")
                    and "motion" not in norm)
        return modality in norm

    found: Dict[str, str] = {}
    if not os.path.isdir(save_dir):
        return found
    entries = sorted(os.listdir(save_dir))
    for modality in MODALITY_ORDER:
        # across ALL matching run dirs, take the highest step (reference
        # semantics: max epoch across candidates)
        best_step = -1
        for entry in entries:
            full = os.path.join(save_dir, entry)
            if os.path.isdir(full) and has_modality(entry, modality):
                latest = latest_checkpoint(full)
                if latest:
                    step = int(os.path.basename(latest))
                    if step > best_step:
                        best_step = step
                        found[modality] = latest
        if modality in found:
            continue
        pts = [p for p in _glob.glob(os.path.join(save_dir, "*.pt"))
               if has_modality(os.path.basename(p).rsplit("-", 2)[0],
                               modality)]
        if pts:
            def epoch_of(p):
                parts = os.path.splitext(os.path.basename(p))[0].rsplit(
                    "-", 2)
                # non-numeric epoch tokens (e.g. 'fall-bone-final.pt')
                # sort as epoch 0 instead of aborting auto-detect
                if len(parts) >= 3 and parts[-2].isdigit():
                    return int(parts[-2])
                return 0
            found[modality] = max(pts, key=epoch_of)
    return found


def run_pipeline(
    video_path: str,
    checkpoints: Optional[Dict[str, str]] = None,
    *,
    fourstream_checkpoint: Optional[str] = None,
    output_json: Optional[str] = None,
    output_video: Optional[str] = None,
    window: int = 300,
    stride: int = 150,
    threshold: float = 0.5,
    pose_backend: str = "mediapipe",
    max_frames: int = 100000,
    model_config: Optional[ModelConfig] = None,
) -> Dict:
    """Full video -> report (reference: run_pipeline,
    inference_pipeline.py:574-670).  Models come either from per-modality
    `checkpoints` (reference layout: four run dirs) or from one
    `fourstream_checkpoint` (concurrent-fourstream training).

    ``output_video``: write an annotated mp4 (skeleton overlay from the
    backend's pixel landmarks, probability bar, fall-interval tint) — the
    reference wires this at inference_pipeline.py:663-667."""
    from shift_gcn_tpu.data.gendata.mediapipe import (
        get_backend, pixel_landmarks, world_landmarks)

    if (checkpoints is None) == (fourstream_checkpoint is None):
        raise ValueError(
            "pass exactly one of checkpoints / fourstream_checkpoint")
    backend = get_backend(pose_backend)
    result = backend(video_path, max_frames)
    landmarks = world_landmarks(result)
    if landmarks is None:
        raise RuntimeError(f"no pose could be extracted from {video_path}")
    if fourstream_checkpoint is not None:
        predictor = EnsemblePredictor.from_fourstream_checkpoint(
            fourstream_checkpoint, model_config=model_config)
    else:
        predictor = EnsemblePredictor(checkpoints,
                                      model_config=model_config)
    report = run_on_landmarks(
        landmarks, predictor, window=window, stride=stride,
        threshold=threshold)
    report["video"] = os.path.basename(video_path)
    # persist the scores/report JSON BEFORE the (failure-prone) video
    # render so a render exception never loses the inference result; on
    # render success the file is rewritten with 'annotated_video' added,
    # so a saved report claims the video only when it actually exists
    if output_json:
        with open(output_json, "w") as f:
            json.dump(report, f, indent=2)
    if output_video:
        from shift_gcn_tpu.inference.render import render_annotated_video

        render_annotated_video(
            video_path, output_video,
            frame_probs=report["frame_probabilities"],
            fall_intervals=report["fall_intervals"],
            graph=predictor.graph,
            pixel_landmarks=pixel_landmarks(result),
            threshold=threshold)
        report["annotated_video"] = output_video
        if output_json:
            with open(output_json, "w") as f:
                json.dump(report, f, indent=2)
    return report


def add_checkpoint_args(parser) -> None:
    """Install the model-selection CLI args shared by the offline
    pipeline and the streaming CLI (streaming.py)."""
    parser.add_argument("--joint", default=None)
    parser.add_argument("--bone", default=None)
    parser.add_argument("--joint-motion", default=None)
    parser.add_argument("--bone-motion", default=None)
    parser.add_argument("--fourstream", default=None,
                        help="one concurrent-fourstream checkpoint "
                        "(replaces the four per-modality paths)")
    parser.add_argument("--save-dir", default=None,
                        help="auto-detect per-modality checkpoints under "
                        "this save-models root (reference "
                        "inference_pipeline.py:28-38)")


def resolve_checkpoint_args(parser, args) -> Optional[Dict[str, str]]:
    """args from :func:`add_checkpoint_args` -> per-modality checkpoint
    dict, or None when --fourstream was given (the caller then uses
    ``args.fourstream``).  parser.error()s on an unusable combination."""
    if args.fourstream is not None:
        return None
    if args.save_dir:
        ckpts = auto_detect_checkpoints(args.save_dir)
        if not ckpts:
            parser.error(f"no checkpoints found under {args.save_dir}")
        return ckpts
    if args.joint is None:
        parser.error("--joint (or --fourstream / --save-dir) is required")
    ckpts = {"joint": args.joint}
    for key in ("bone", "joint_motion", "bone_motion"):
        val = getattr(args, key)
        if val:
            ckpts[key] = val
    return ckpts


def main(argv=None):
    import argparse

    parser = argparse.ArgumentParser(description="fall-detection inference")
    parser.add_argument("--video", required=True)
    add_checkpoint_args(parser)
    parser.add_argument("--output", default="results.json")
    parser.add_argument("--output-video", default=None,
                        help="write an annotated mp4 here")
    parser.add_argument("--threshold", type=float, default=0.5)
    parser.add_argument("--window", type=int, default=300)
    parser.add_argument("--stride", type=int, default=150)
    args = parser.parse_args(argv)
    ckpts = resolve_checkpoint_args(parser, args)
    report = run_pipeline(
        args.video, ckpts, fourstream_checkpoint=args.fourstream,
        output_json=args.output, output_video=args.output_video,
        window=args.window, stride=args.stride, threshold=args.threshold)
    print(json.dumps({k: v for k, v in report.items()
                      if k != "frame_probabilities"}, indent=2))


if __name__ == "__main__":
    main()
