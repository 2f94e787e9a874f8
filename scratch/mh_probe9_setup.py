import os, pickle, sys
import numpy as np
import yaml
tmp = sys.argv[1]
os.makedirs(tmp, exist_ok=True)
rng = np.random.default_rng(7)
v, c = 64, 8
lift = rng.choice(v, v // 4, replace=False)
for prefix, n in (("train", 16), ("val", 9)):
    labels = rng.integers(0, 2, n)
    data = rng.standard_normal((n, c, 1, v, 1)).astype(np.float32) * 0.3
    for i in range(n):
        if labels[i] == 1:
            data[i, 0, 0, lift, 0] += 0.8
    names = [f"{prefix}{i}.node" for i in range(n)]
    np.save(f"{tmp}/{prefix}_data.npy", data)
    with open(f"{tmp}/{prefix}_label.pkl", "wb") as f:
        pickle.dump((names, labels.tolist()), f)
cfg = {
    "Experiment_name": "ring", "work_dir": f"{tmp}/work",
    "model_saved_name": f"{tmp}/save",
    "model": "shift_gcn_tpu.models.ring_gnn",
    "model_args": {"num_class": 2, "num_nodes": v, "in_channels": c, "hidden": [16]},
    "train_feeder_args": {"data_path": f"{tmp}/train_data.npy", "label_path": f"{tmp}/train_label.pkl"},
    "test_feeder_args": {"data_path": f"{tmp}/val_data.npy", "label_path": f"{tmp}/val_label.pkl"},
    "batch_size": 4, "test_batch_size": 4, "base_lr": 0.05, "step": [100],
    "num_epoch": 1, "nesterov": True, "device_guard": False, "print_log": False,
    "mesh_shape": [1, 8], "edge_partition": True, "edge_strategy": "ring",
}
with open(f"{tmp}/cfg.yaml", "w") as f:
    yaml.safe_dump(cfg, f)
