"""Visual-inspection helpers (reference feeder.test()/adjacency imshow
parity): headless smoke tests via the Agg backend."""

import numpy as np
import pytest

mpl = pytest.importorskip("matplotlib")
mpl.use("Agg")


def test_plot_adjacency_writes_file(tmp_path):
    from shift_gcn_tpu.utils.visualize import plot_adjacency

    out = tmp_path / "adj.png"
    plot_adjacency("ntu_rgb_d", save_path=str(out))
    assert out.exists() and out.stat().st_size > 0


def test_animate_skeleton_writes_file(tmp_path):
    from shift_gcn_tpu.utils.visualize import animate_skeleton

    rng = np.random.default_rng(0)
    clip = rng.standard_normal((3, 6, 25, 1)).astype(np.float32)
    out = tmp_path / "clip.gif"
    animate_skeleton(clip, "ntu_rgb_d", save_path=str(out))
    assert out.exists() and out.stat().st_size > 0
