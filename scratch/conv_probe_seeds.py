"""Seed-robustness of the to-convergence parity bands (PARITY.md)."""
import sys, time
sys.path.insert(0, "/root/repo/tests")
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import test_convergence_parity as m
from shift_gcn_tpu.models.shift_gcn import init_params

for seed in (101, 202):
    t0 = time.time()
    xtr, ytr = m._make_dataset(m._N_TRAIN, seed=seed)
    xev, yev = m._make_dataset(m._N_EVAL, seed=seed + 6)
    params, bn = init_params(jax.random.key(seed), m._CONFIG)
    pn = jax.tree_util.tree_map(np.asarray, params)
    sn = jax.tree_util.tree_map(np.asarray, bn)
    tl, tacc = m._run_torch_to_plateau(pn, sn, xtr, ytr, xev, yev)
    jl, jacc = m._run_jax_to_plateau(m._CONFIG, xtr, ytr, xev, yev,
                                     seed=seed)
    print(f"seed {seed}: torch {tacc:.4f} jax {jacc:.4f} "
          f"|d|={abs(tacc-jacc):.4f} loss_d="
          f"{abs(tl[-30:].mean()-jl[-30:].mean()):.4f} "
          f"[{time.time()-t0:.0f}s]", flush=True)
