"""Native C++ batch loader vs numpy indexing (build + ctypes roundtrip)."""

import numpy as np
import pytest

from shift_gcn_tpu.data.native_loader import (
    NativeClipLoader, NativeLoaderUnavailable)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    path = tmp_path_factory.mktemp("native") / "data.npy"
    rng = np.random.default_rng(0)
    data = rng.standard_normal((20, 3, 8, 5, 1)).astype(np.float32)
    np.save(path, data)
    return str(path), data


def _loader(path):
    try:
        return NativeClipLoader(path, num_threads=2)
    except NativeLoaderUnavailable as e:
        pytest.skip(f"native toolchain unavailable: {e}")


def test_shape_and_gather(dataset):
    path, data = dataset
    loader = _loader(path)
    assert loader.shape == data.shape
    idx = np.array([3, 0, 19, 7])
    out = loader.gather(idx)
    np.testing.assert_array_equal(out, data[idx])
    loader.close()


def test_prefetch_roundtrip(dataset):
    path, data = dataset
    loader = _loader(path)
    idx1 = np.array([1, 2, 3])
    idx2 = np.array([4, 5, 6])
    loader.prefetch(idx1)
    got1 = loader.wait()
    loader.prefetch(idx2)
    got2 = loader.wait()
    np.testing.assert_array_equal(got1, data[idx1])
    np.testing.assert_array_equal(got2, data[idx2])
    loader.close()


def test_out_of_range_raises(dataset):
    path, _ = dataset
    loader = _loader(path)
    with pytest.raises(IndexError):
        loader.gather(np.array([99]))
    loader.close()


def test_float64_input_converts(tmp_path):
    data = np.arange(40, dtype=np.float64).reshape(4, 10)
    path = tmp_path / "f8.npy"
    np.save(path, data)
    loader = _loader(str(path))
    out = loader.gather(np.array([2, 1]))
    assert out.dtype == np.float32
    np.testing.assert_allclose(out, data[[2, 1]].astype(np.float32))
    loader.close()
