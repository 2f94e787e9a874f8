"""Generate a synthetic node-feature dataset for the ring_gnn family
(configs/synthetic_ring.yaml).

Each sample is one (V, C) node-feature frame stored in the standard
feeder clip layout (N, C, T=1, V, M=1), so the whole Feeder/Trainer
stack works unchanged.  Classes are separable through the graph: class 1
lifts channel 0 on a fixed node subset, which the aggregation spreads to
neighbors.
"""

import argparse
import os
import pickle

import numpy as np


def make_split(path, prefix, n, v, c, seed):
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, 2, n)
    data = rng.standard_normal((n, c, 1, v, 1)).astype(np.float32) * 0.3
    lift_nodes = rng.choice(v, v // 4, replace=False)
    for i in range(n):
        if labels[i] == 1:
            data[i, 0, 0, lift_nodes, 0] += 0.8
    names = [f"{prefix}{i}.node" for i in range(n)]
    np.save(os.path.join(path, f"{prefix}_data.npy"), data)
    with open(os.path.join(path, f"{prefix}_label.pkl"), "wb") as f:
        pickle.dump((names, labels.tolist()), f)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/ring_data")
    ap.add_argument("--num-nodes", type=int, default=256)
    ap.add_argument("--channels", type=int, default=8)
    ap.add_argument("--train", type=int, default=256)
    ap.add_argument("--val", type=int, default=128)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    make_split(args.out, "train", args.train, args.num_nodes,
               args.channels, seed=5)
    make_split(args.out, "val", args.val, args.num_nodes,
               args.channels, seed=6)
    print(f"wrote ring_gnn dataset to {args.out}")


if __name__ == "__main__":
    main()
