import sys, time
sys.path.insert(0, "/root/repo/tests")
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np, dataclasses
import test_convergence_parity as m
from shift_gcn_tpu.models.shift_gcn import init_params

t0 = time.time()
xtr, ytr = m._make_dataset(m._N_TRAIN, seed=23)
xev, yev = m._make_dataset(m._N_EVAL, seed=29)
params, bn = init_params(jax.random.key(11), m._CONFIG)
pn = jax.tree_util.tree_map(np.asarray, params)
sn = jax.tree_util.tree_map(np.asarray, bn)
tl, tacc = m._run_torch_to_plateau(pn, sn, xtr, ytr, xev, yev)
print(f"torch: acc={tacc:.4f} first={tl[:30].mean():.4f} last={tl[-30:].mean():.4f} [{time.time()-t0:.0f}s]", flush=True)
jl, jacc = m._run_jax_to_plateau(m._CONFIG, xtr, ytr, xev, yev)
print(f"jax fp32: acc={jacc:.4f} first={jl[:30].mean():.4f} last={jl[-30:].mean():.4f} [{time.time()-t0:.0f}s]", flush=True)
cfg16 = dataclasses.replace(m._CONFIG, activation_dtype="bfloat16")
jl16, jacc16 = m._run_jax_to_plateau(cfg16, xtr, ytr, xev, yev)
print(f"jax bf16: acc={jacc16:.4f} first={jl16[:30].mean():.4f} last={jl16[-30:].mean():.4f} [{time.time()-t0:.0f}s]", flush=True)
print(f"bands: |t-j32|={abs(tacc-jacc):.4f} |t-j16|={abs(tacc-jacc16):.4f} |loss_t-loss_j|={abs(tl[-30:].mean()-jl[-30:].mean()):.4f}")
