import numpy as np, torch, jax, dataclasses
jax.config.update("jax_platforms", "cpu")
import sys; sys.path.insert(0, "/root/repo/tests"); sys.path.insert(0, "/root/repo")
import test_trajectory_parity as tp
from shift_gcn_tpu.models.shift_gcn import init_params
from shift_gcn_tpu.ops.lowering import Lowering

def flat(tree, prefix=""):
    for k, v in tree.items():
        if isinstance(v, dict): yield from flat(v, f"{prefix}{k}.")
        else: yield prefix + k, np.asarray(v)

for label, low, adtype in (("conv-fp32", Lowering(tshift_impl="conv"), None),
                           ("dft-fp32", None, None),
                           ("dft-bf16", None, "bfloat16")):
    cfg = dataclasses.replace(tp._CONFIG, lowering=low, activation_dtype=adtype)
    params, st = init_params(jax.random.key(11), cfg)
    pn = jax.tree_util.tree_map(np.asarray, params)
    sn = jax.tree_util.tree_map(np.asarray, st)
    xs, ys = tp._make_batches()
    tm, tl, ty = tp._run_torch(pn, sn, xs, ys)
    js, jl, jy = tp._run_jax(cfg, params, st, xs, ys)
    d = np.abs(jl - tl)
    named = dict(tm.named_parameters()); named.update(dict(tm.named_buffers()))
    wabs = []
    for name, jval in list(flat(js.params)) + list(flat(js.bn_state)):
        if "num_batches" in name: continue
        t = named[name].detach().numpy()
        wabs.append((np.abs(jval - t).max(), name))
    wabs.sort(reverse=True)
    ydiff = np.abs(jy - ty)
    first = next((i for i in range(len(ydiff)) if ydiff[i].max() > 1e-6), 99)
    print(f"{label}: firstdiv {first}  maxloss {d.max():.3f}  meanloss {d.mean():.4f}  "
          f"last15meanloss {d[-15:].mean():.4f}  ypos {ydiff.max():.4f}")
    print("   worst param absdiffs:", [(f"{v:.4f}", n) for v, n in wabs[:4]])
    print(f"   descent torch {tl[0]:.2f}->{np.mean(tl[-5:]):.2f} jax {jl[0]:.2f}->{np.mean(jl[-5:]):.2f}")
