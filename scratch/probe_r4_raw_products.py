import numpy as np, torch, jax, jax.numpy as jnp, dataclasses
jax.config.update("jax_platforms", "cpu")
import sys; sys.path.insert(0, "/root/repo/tests"); sys.path.insert(0, "/root/repo")
import test_trajectory_parity as tp
from shift_gcn_tpu.models.shift_gcn import init_params
from shift_gcn_tpu.models import shift_gcn as sg
from shift_gcn_tpu.train import state as state_lib
import importlib
ts_mod = importlib.import_module("shift_gcn_tpu.ops.temporal_shift")
from shift_gcn_tpu.ops.lowering import Lowering
import torch.nn.functional as F

cfg = dataclasses.replace(tp._CONFIG, lowering=Lowering(tshift_impl="conv"))
params, st = init_params(jax.random.key(11), cfg)
pn = jax.tree_util.tree_map(np.asarray, params)
sn = jax.tree_util.tree_map(np.asarray, st)
xs, ys = tp._make_batches()
xb, yb = xs[0], ys[0]

trecs = []
orig_bwd = tp._ShiftFn.backward
def patched(ctx, g):
    x, xpos, ypos_eff = ctx.saved_tensors
    trecs.append((x.detach().numpy().copy(),
                  g.contiguous().detach().numpy().copy(),
                  ypos_eff.detach().numpy().copy(), ctx.stride))
    return orig_bwd(ctx, g)
tp._ShiftFn.backward = staticmethod(patched)
torch.manual_seed(0)
tm = tp._TorchModel(cfg); tp._load_from_pytree(tm, pn, sn); tm.train()
loss = F.cross_entropy(tm(torch.as_tensor(xb)), torch.as_tensor(yb).long())
loss.backward()

jrecs = []
real_ts = ts_mod.temporal_shift

def spy_shift(x, xpos, ypos, stride=1, low=None):
    @jax.custom_vjp
    def f(x, xpos, ypos):
        return real_ts(x, xpos, ypos, stride, low)
    def fwd(x, xpos, ypos):
        return f(x, xpos, ypos), (x, xpos, ypos)
    def bwd(res, g):
        x_, xp_, yp_ = res
        jax.debug.callback(lambda a, b, c: jrecs.append(
            (np.asarray(a), np.asarray(b), np.asarray(c), stride)), x_, g, yp_)
        _, vjp = jax.vjp(lambda a, b, c: real_ts(a, b, c, stride, low),
                         x_, xp_, yp_)
        return vjp(g)
    f.defvjp(fwd, bwd)
    return f(x, xpos, ypos)

sg.temporal_shift = spy_shift

def loss_fn(p, s):
    logits, _ = sg.apply(p, s, jnp.asarray(xb), cfg, training=True)
    return state_lib.cross_entropy(logits, jnp.asarray(yb))

jax.grad(loss_fn)(params, st)
sg.temporal_shift = real_ts

print("torch recs:", len(trecs), "jax recs:", len(jrecs))

def raw64_t(x, g, yp, stride):
    dval = tp._np_shift_dval_y(x.astype(np.float64), np.zeros(x.shape[1]),
                               yp.astype(np.float64), stride)
    return (dval * g.astype(np.float64)).mean(axis=0).sum(axis=(1, 2))

def raw64_j(x, g, yp, stride):
    xt = np.transpose(x, (0, 3, 1, 2)); gt = np.transpose(g, (0, 3, 1, 2))
    return raw64_t(xt, gt, yp, stride)

for (tx, tg, typ, tstr) in trecs:
    for (jx, jg, jyp, jstr) in jrecs:
        eff = jyp + (0.5 if jstr != 1 else 0)
        if eff.shape == typ.shape and jstr == tstr and np.allclose(eff, typ, atol=1e-6):
            rt = raw64_t(tx, tg, typ, tstr)
            rj = raw64_j(jx, jg, eff, jstr)
            rel = np.abs(rt - rj) / (np.abs(rt) + 1e-12)
            sd = int((np.sign(rt) != np.sign(rj)).sum())
            # also compare the cotangents themselves
            gt2 = np.transpose(jg, (0, 3, 1, 2))
            gdiff = np.abs(gt2 - tg).max() / (np.abs(tg).max() + 1e-12)
            xt2 = np.transpose(jx, (0, 3, 1, 2))
            xdiff = np.abs(xt2 - tx).max() / (np.abs(tx).max() + 1e-12)
            print(f"C={len(typ)} stride={tstr}: raw maxrel {rel.max():.2e} "
                  f"signdiffs {sd} gdiff {gdiff:.2e} xdiff {xdiff:.2e}")
            break
