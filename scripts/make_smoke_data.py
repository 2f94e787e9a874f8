"""Generate the synthetic smoke dataset used by configs/smoke.yaml.

T=160 (not smaller): on the axon TPU platform, eval graphs with
T//4 < the temporal-shift tap window fault the remote worker (see
ops/temporal_shift.py); 160 keeps every block's T comfortably above it.
"""

import os
import pickle

import numpy as np


def main(out_dir="/tmp/smoke", n=64, t=160, v=33, seed=0):
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, 2, n)
    data = (rng.standard_normal((n, 3, t, v, 1)) * 0.1).astype(np.float32)
    drift = np.linspace(0, 1, t)[:, None, None]
    for i in range(n):
        if labels[i] == 1:
            data[i, 1] += drift
    np.save(os.path.join(out_dir, "data.npy"), data)
    with open(os.path.join(out_dir, "label.pkl"), "wb") as f:
        pickle.dump(([f"s{i}" for i in range(n)], labels.tolist()), f)
    print(f"wrote {n} clips (3,{t},{v},1) to {out_dir}")


if __name__ == "__main__":
    main()
