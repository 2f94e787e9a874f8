"""Round-4 verify: TPU smoke of the lowering-config surface."""
import numpy as np, jax, jax.numpy as jnp

# healthcheck matmul (precision pinned — bf16 default on this platform)
a = jnp.ones((128, 128)); b = jnp.ones((128, 128))
r = jax.jit(lambda x, y: x @ y)(a, b)
print("health:", float(r[0, 0]), r.device, flush=True)
assert abs(float(r[0, 0]) - 128.0) < 0.5

from shift_gcn_tpu.ops.temporal_shift import temporal_shift
from shift_gcn_tpu.ops.lowering import Lowering

rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((2, 128, 5, 6)), jnp.float32)
ypos = jnp.asarray(rng.uniform(-2, 2, 6), jnp.float32)
xpos = jnp.zeros(6)

# explicit config lowering on REAL TPU: conv vs dft agree; constraint grad
outs = {}
for impl in ("conv", "dft"):
    low = Lowering(tshift_impl=impl)
    f = jax.jit(lambda xx: temporal_shift(xx, xpos, ypos, 1, low))
    outs[impl] = np.asarray(f(x))
    g = jax.jit(jax.grad(lambda yp: jnp.sum(
        temporal_shift(x, xpos, yp, 1, low))))(ypos)
    gy = np.asarray(g)
    assert np.allclose(np.abs(gy), 0.01, atol=1e-6), (impl, gy)
    print(f"{impl}: out[0,0,0,0]={outs[impl][0,0,0,0]:.6f} |gy|==0.01 OK",
          flush=True)
print("device:", f(x).device, flush=True)
np.testing.assert_allclose(outs["conv"], outs["dft"], atol=0.03)  # platform-default bf16 matmul on TPU (CLAUDE.md 2026-08-18)

# model forward with a config lowering on TPU
from shift_gcn_tpu.models import shift_gcn
from shift_gcn_tpu.models.shift_gcn import BlockSpec, ModelConfig, init_params
cfg = ModelConfig(num_class=2, num_point=25, num_person=1,
                  graph="ntu_rgb_d",
                  blocks=(BlockSpec(3, 8, residual=False),
                          BlockSpec(8, 16, stride=2)),
                  lowering=Lowering(tshift_impl="conv", sgcn_impl="chain"))
p, s = init_params(jax.random.key(0), cfg)
xb = jnp.asarray(rng.standard_normal((2, 3, 128, 25, 1)), jnp.float32)
fm = jax.jit(lambda pp, ss, xx: shift_gcn.apply(pp, ss, xx, cfg,
                                                training=False)[0])
logits = fm(p, s, xb)
print("model logits device:", logits.device, "val:",
      np.asarray(logits)[0], flush=True)
cfg2 = ModelConfig(num_class=2, num_point=25, num_person=1,
                   graph="ntu_rgb_d",
                   blocks=cfg.blocks)  # default dft lowering, same process
fm2 = jax.jit(lambda pp, ss, xx: shift_gcn.apply(pp, ss, xx, cfg2,
                                                 training=False)[0])
np.testing.assert_allclose(np.asarray(fm2(p, s, xb)), np.asarray(logits),
                           rtol=0.03, atol=0.03)
print("VERIFY-TPU-OK", flush=True)
