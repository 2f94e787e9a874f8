"""Skeleton clip feeder: mmap-backed dataset + deterministic batched iterator.

Replaces the reference torch Dataset/DataLoader pair (feeders/feeder.py:11-95,
main.py:231-251) with a host-side numpy pipeline designed for TPU input:

- fixed static shapes (T is padded/cropped to window_size → XLA-friendly),
- per-host sharding for multi-host data parallelism (each host reads its own
  contiguous shard of the epoch permutation),
- background-thread prefetch of the next batch while the device computes,
- deterministic epoch shuffles from a seed (epoch-keyed, resume-safe).
"""

from __future__ import annotations

import pickle
import queue
import threading
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

from shift_gcn_tpu.data import augmentations as aug


class Feeder:
    """Dataset over (N, C, T, V, M) .npy data + (names, labels) pickle.

    Mirrors reference feeder semantics (feeders/feeder.py:41-90): optional
    mean/std normalization, random_shift, random_choose / auto-pad to
    window_size, random_move; `debug` truncates to the first 100 samples.
    """

    def __init__(
        self,
        data_path: str,
        label_path: str,
        *,
        random_choose: bool = False,
        random_shift: bool = False,
        random_move: bool = False,
        window_size: int = -1,
        normalization: bool = False,
        debug: bool = False,
        use_mmap: bool = True,
        native: bool = False,
        native_threads: int = 4,
        pad_to_frames: int = 0,
    ):
        """``pad_to_frames``: pad every clip's time axis up to this
        length (after any window/augmentation) with empty frames — raw
        zeros, or (0 - mean)/std under ``normalization`` so the appended
        frames match how gendata's trailing zero frames come out of the
        normalize map.  Use e.g. 304/320 to satisfy `shard_time`'s
        divisibility requirement (parallel/seqpar.py)."""
        self.data_path = data_path
        self.label_path = label_path
        self.random_choose = random_choose
        self.random_shift = random_shift
        self.random_move = random_move
        self.window_size = window_size
        self.normalization = normalization
        self.pad_to_frames = pad_to_frames

        with open(label_path, "rb") as f:
            try:
                self.sample_name, self.label = pickle.load(f)
            except UnicodeDecodeError:
                f.seek(0)
                self.sample_name, self.label = pickle.load(
                    f, encoding="latin1")
        self.label = list(self.label)

        self.data = np.load(data_path, mmap_mode="r" if use_mmap else None)
        if debug:
            self.label = self.label[:100]
            self.data = self.data[:100]
            self.sample_name = self.sample_name[:100]

        # optional native (C++ thread-pool) batch gather; only usable on the
        # fast path (no augmentation/normalization, full clips, no debug
        # truncation)
        self.native_loader = None
        if native and not debug:
            try:
                from shift_gcn_tpu.data.native_loader import NativeClipLoader

                self.native_loader = NativeClipLoader(
                    data_path, num_threads=native_threads)
            except Exception:
                self.native_loader = None

        if normalization:
            self._compute_mean_map()

    def supports_native_batch(self) -> bool:
        return (self.native_loader is not None
                and not (self.normalization or self.random_shift
                         or self.random_choose or self.random_move
                         or self.window_size > 0
                         or self.pad_to_frames > 0))

    def _compute_mean_map(self) -> None:
        # reference: feeders/feeder.py:62-66
        data = self.data
        n, c, t, v, m = data.shape
        self.mean_map = data.mean(axis=2, keepdims=True).mean(
            axis=4, keepdims=True).mean(axis=0)
        self.std_map = data.transpose((0, 2, 4, 1, 3)).reshape(
            (n * t * m, c * v)).std(axis=0).reshape((c, 1, v, 1))

    def __len__(self) -> int:
        return len(self.label)

    def get(self, index: int,
            rng: Optional[np.random.Generator] = None) -> np.ndarray:
        """Fetch one augmented clip (C, T, V, M) float32."""
        sample = np.array(self.data[index], dtype=np.float32)
        if self.normalization:
            sample = (sample - self.mean_map) / self.std_map
        if self.random_shift and rng is not None:
            sample = aug.random_shift(sample, rng)
        if self.random_choose and rng is not None:
            sample = aug.random_choose(sample, self.window_size, rng)
        elif self.window_size > 0:
            sample = aug.auto_pad(sample, self.window_size)
        if self.random_move and rng is not None:
            sample = aug.random_move(sample, rng)
        if self.pad_to_frames > sample.shape[1]:
            pad = self.pad_to_frames - sample.shape[1]
            c, _, v, m = sample.shape
            if self.normalization:
                # an "empty frame" after normalization is (0 - mean)/std,
                # not 0 — pad with the transformed value so appended
                # frames match gendata's zero-frame convention exactly
                fill = np.broadcast_to(
                    (-self.mean_map / self.std_map).astype(sample.dtype),
                    (c, 1, v, m))
                fill = np.broadcast_to(fill, (c, pad, v, m))
            else:
                fill = np.zeros((c, pad, v, m), sample.dtype)
            sample = np.concatenate([sample, fill], axis=1)
        return sample.astype(np.float32)

    def top_k(self, score: np.ndarray, k: int) -> float:
        """Fraction of samples whose label is in the top-k scores
        (reference: feeders/feeder.py:92-95)."""
        rank = score.argsort()
        hit = [l in rank[i, -k:] for i, l in enumerate(self.label)]
        return sum(hit) * 1.0 / len(hit)


class BatchIterator:
    """Deterministic, host-sharded, prefetching batch iterator.

    Each epoch draws a permutation from seed+epoch; the permutation is split
    evenly across `num_hosts` (this host takes shard `host_id`), then batched.
    With drop_last=False the final short batch is zero-padded to the static
    batch size and a validity mask is emitted (static shapes for XLA).
    """

    def __init__(
        self,
        feeder: Feeder,
        batch_size: int,
        *,
        shuffle: bool = False,
        drop_last: bool = False,
        seed: int = 1,
        host_id: int = 0,
        num_hosts: int = 1,
        prefetch: int = 2,
    ):
        self.feeder = feeder
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.host_id = host_id
        self.num_hosts = num_hosts
        self.prefetch = prefetch

    def _host_quota(self) -> int:
        """Samples each host is responsible for.  Training
        (drop_last=True): floor — equal shards, surplus dropped like
        DistributedSampler-with-drop-extras, so every host runs the same
        step count (multi-process collectives need lockstep).  Eval
        (drop_last=False): ceil — every sample is assigned to exactly
        one host (the last host's shard may run short; its trailing
        batches pad with mask-0 entries so step counts still match)."""
        n = len(self.feeder)
        if self.num_hosts <= 1:
            return n
        if self.drop_last:
            return n // self.num_hosts
        return -(-n // self.num_hosts)

    def _epoch_indices(self, epoch: int) -> np.ndarray:
        n = len(self.feeder)
        if self.shuffle:
            order = np.random.default_rng(
                self.seed + 1000003 * epoch).permutation(n)
        else:
            order = np.arange(n)
        per_host = self._host_quota()
        start = self.host_id * per_host
        return order[start:start + per_host]

    def batches_per_epoch(self) -> int:
        # from the QUOTA, not the local shard length: under eval
        # host-sharding with indivisible n the last host's shard is
        # short, but every host must execute the same number of
        # (collective-running) eval steps
        q = self._host_quota()
        if self.drop_last:
            return q // self.batch_size
        return -(-q // self.batch_size)

    def _make_batch(
        self, idx: np.ndarray, rng: np.random.Generator
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        if len(idx) == 0:
            # a fully-padded batch: the last host's eval shard ran out
            # but every host must step in lockstep (_host_quota)
            probe = self.feeder.get(0, rng)
            return (np.zeros((self.batch_size,) + probe.shape,
                             np.float32),
                    np.zeros(self.batch_size, np.int32),
                    np.full(self.batch_size, -1, np.int32),
                    np.zeros(self.batch_size, np.float32))
        if self.feeder.supports_native_batch():
            data = self.feeder.native_loader.gather(idx)
        else:
            data = np.stack(
                [self.feeder.get(int(i), rng) for i in idx])
        labels = np.asarray([self.feeder.label[int(i)] for i in idx],
                            dtype=np.int32)
        mask = np.ones(len(idx), dtype=np.float32)
        if len(idx) < self.batch_size:
            pad = self.batch_size - len(idx)
            data = np.concatenate(
                [data, np.zeros((pad,) + data.shape[1:], data.dtype)])
            labels = np.concatenate([labels, np.zeros(pad, np.int32)])
            mask = np.concatenate([mask, np.zeros(pad, np.float32)])
            idx = np.concatenate([idx, np.full(pad, -1, idx.dtype)])
        return data, labels, idx.astype(np.int32), mask

    def epoch(self, epoch: int) -> Iterator[
            Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]]:
        """Yield (data, label, index, mask) batches with thread prefetch."""
        order = self._epoch_indices(epoch)
        nb = self.batches_per_epoch()
        rng = np.random.default_rng(
            self.seed + 7919 * epoch + 104729 * self.host_id)

        q: "queue.Queue" = queue.Queue(maxsize=max(1, self.prefetch))
        sentinel = object()

        def producer():
            try:
                for b in range(nb):
                    idx = order[b * self.batch_size:(b + 1) * self.batch_size]
                    q.put(self._make_batch(idx, rng))
            finally:
                q.put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item
        t.join()
