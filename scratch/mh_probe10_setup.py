import os, pickle, sys
import numpy as np
import yaml
tmp = sys.argv[1]
os.makedirs(tmp, exist_ok=True)
rng = np.random.default_rng(11)
for prefix, n in (("train", 16), ("val", 9)):
    labels = rng.integers(0, 2, n)
    data = rng.standard_normal((n, 3, 16, 33, 1)).astype(np.float32) * 0.1
    drift = np.linspace(0, 1, 16)[:, None, None]
    for i in range(n):
        if labels[i] == 1:
            data[i, 1] += drift
    names = [f"{prefix}{i}.skeleton" for i in range(n)]
    np.save(f"{tmp}/{prefix}_data.npy", data)
    with open(f"{tmp}/{prefix}_label.pkl", "wb") as f:
        pickle.dump((names, labels.tolist()), f)
cfg = {
    "Experiment_name": "fs", "work_dir": f"{tmp}/work",
    "model_saved_name": f"{tmp}/save",
    "train_feeder_args": {"data_path": f"{tmp}/train_data.npy", "label_path": f"{tmp}/train_label.pkl"},
    "test_feeder_args": {"data_path": f"{tmp}/val_data.npy", "label_path": f"{tmp}/val_label.pkl"},
    "model_args": {"num_class": 2, "num_point": 33, "num_person": 1, "graph": "mediapipe_pose",
                    "blocks": [[3, 8, 1, False], [8, 16, 2, True]]},
    "batch_size": 4, "test_batch_size": 4, "base_lr": 0.05, "step": [100],
    "num_epoch": 1, "nesterov": True, "device_guard": False, "print_log": False,
    "fourstream": True,
}
with open(f"{tmp}/cfg.yaml", "w") as f:
    yaml.safe_dump(cfg, f)
