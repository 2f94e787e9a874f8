"""BatchIterator: determinism, host sharding, drop_last, augmentation hooks."""

import pickle

import numpy as np

from shift_gcn_tpu.data.feeder import BatchIterator, Feeder


def _feeder(tmp_path, n=24, t=10, v=5):
    rng = np.random.default_rng(0)
    data = rng.standard_normal((n, 3, t, v, 1)).astype(np.float32)
    np.save(tmp_path / "d.npy", data)
    with open(tmp_path / "l.pkl", "wb") as f:
        pickle.dump(([f"s{i}" for i in range(n)],
                     list(rng.integers(0, 2, n))), f)
    return Feeder(data_path=str(tmp_path / "d.npy"),
                  label_path=str(tmp_path / "l.pkl")), data


def test_epoch_shuffle_deterministic_and_varies(tmp_path):
    feeder, _ = _feeder(tmp_path)
    it = BatchIterator(feeder, 8, shuffle=True, seed=3)
    a = [idx.tolist() for _, _, idx, _ in it.epoch(0)]
    b = [idx.tolist() for _, _, idx, _ in it.epoch(0)]
    c = [idx.tolist() for _, _, idx, _ in it.epoch(1)]
    assert a == b          # same epoch, same order
    assert a != c          # different epoch reshuffles


def test_host_sharding_partitions_samples(tmp_path):
    feeder, _ = _feeder(tmp_path)
    seen = []
    for host in range(2):
        it = BatchIterator(feeder, 4, shuffle=True, seed=3,
                           host_id=host, num_hosts=2)
        for _, _, idx, _ in it.epoch(0):
            seen.extend(int(i) for i in idx)
    assert len(seen) == 24
    assert len(set(seen)) == 24  # disjoint cover


def test_drop_last(tmp_path):
    feeder, _ = _feeder(tmp_path, n=20)
    it = BatchIterator(feeder, 8, drop_last=True)
    batches = list(it.epoch(0))
    assert len(batches) == 2
    assert it.batches_per_epoch() == 2


def test_batch_content_matches_dataset(tmp_path):
    feeder, data = _feeder(tmp_path)
    it = BatchIterator(feeder, 6, shuffle=False)
    d, labels, idx, mask = next(iter(it.epoch(0)))
    np.testing.assert_array_equal(d, data[:6])
    assert mask.all()


def test_pad_to_frames(tmp_path):
    """pad_to_frames zero-extends the time axis — the knob that makes
    T=300 data satisfy shard_time's divisibility (pad to 304/320)."""
    rng = np.random.default_rng(2)
    data = rng.standard_normal((4, 3, 10, 5, 1)).astype(np.float32)
    np.save(tmp_path / "d.npy", data)
    with open(tmp_path / "l.pkl", "wb") as f:
        pickle.dump((["a", "b", "c", "d"], [0, 1, 0, 1]), f)
    feeder = Feeder(data_path=str(tmp_path / "d.npy"),
                    label_path=str(tmp_path / "l.pkl"), pad_to_frames=16)
    clip = feeder.get(0)
    assert clip.shape == (3, 16, 5, 1)
    np.testing.assert_array_equal(clip[:, :10], data[0])
    np.testing.assert_array_equal(clip[:, 10:], 0)
    # no-op when already long enough
    feeder2 = Feeder(data_path=str(tmp_path / "d.npy"),
                     label_path=str(tmp_path / "l.pkl"), pad_to_frames=8)
    assert feeder2.get(0).shape == (3, 10, 5, 1)
    # under normalization, padded frames equal the TRANSFORMED empty
    # frame (0 - mean)/std — the same value gendata's trailing zero
    # frames map to — not raw zeros
    feeder3 = Feeder(data_path=str(tmp_path / "d.npy"),
                     label_path=str(tmp_path / "l.pkl"),
                     pad_to_frames=16, normalization=True)
    clip = feeder3.get(0)
    want = np.broadcast_to(
        (-feeder3.mean_map / feeder3.std_map), (3, 6, 5, 1))
    np.testing.assert_allclose(clip[:, 10:], want, rtol=1e-5)


def test_window_padding_applied(tmp_path):
    rng = np.random.default_rng(1)
    data = rng.standard_normal((4, 3, 7, 5, 1)).astype(np.float32)
    np.save(tmp_path / "d.npy", data)
    with open(tmp_path / "l.pkl", "wb") as f:
        pickle.dump((["a", "b", "c", "d"], [0, 1, 0, 1]), f)
    feeder = Feeder(data_path=str(tmp_path / "d.npy"),
                    label_path=str(tmp_path / "l.pkl"), window_size=12)
    clip = feeder.get(0)
    assert clip.shape == (3, 12, 5, 1)
    np.testing.assert_array_equal(clip[:, 7:], 0)
