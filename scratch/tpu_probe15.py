"""Standalone pallas temporal-shift kernel vs conv lowering on TPU."""
import time
import numpy as np


def main():
    import importlib
    import jax, jax.numpy as jnp
    a = np.random.default_rng(1).standard_normal((128, 128)).astype(np.float32)
    got = np.asarray(jnp.asarray(a) @ jnp.asarray(a))
    if not np.allclose(got, a @ a, atol=1e-2):
        print("UNHEALTHY WORKER — aborting", flush=True)
        return
    print("health: ok", flush=True)
    ts = importlib.import_module("shift_gcn_tpu.ops.temporal_shift")
    pk = importlib.import_module(
        "shift_gcn_tpu.ops.pallas.temporal_shift_kernel")
    ts.ASSUME_XPOS_ZERO = True
    rng = np.random.default_rng(0)

    def timeit(fn, *args, steps=20):
        out = fn(*args); jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / steps

    # shapes matching the model blocks (batch 64, V=33)
    for t, c, stride in [(300, 64, 1), (300, 64, 2), (150, 128, 1),
                         (75, 256, 1)]:
        x = jnp.asarray(rng.standard_normal((64, t, 33, c)), jnp.float32)
        xpos = jnp.zeros(c)
        ypos = jnp.asarray(rng.uniform(-1, 1, c), jnp.float32)
        f_conv = jax.jit(lambda xx, yy, _s=stride: ts.temporal_shift(
            xx, xpos, yy, _s))
        f_pall = jax.jit(lambda xx, yy, _s=stride: pk.temporal_shift_pallas(
            xx, xpos, yy, _s))
        try:
            w = np.asarray(f_conv(x, ypos))
            p = np.asarray(f_pall(x, ypos))
            err = np.abs(w - p).max()
            dt_c = timeit(f_conv, x, ypos)
            dt_p = timeit(f_pall, x, ypos)
            gb = x.nbytes * 2 / 1e9
            print(f"T={t} C={c} s={stride}: conv {dt_c*1e3:.2f} ms "
                  f"({gb/dt_c:.0f} GB/s), pallas {dt_p*1e3:.2f} ms "
                  f"({gb/dt_p:.0f} GB/s), maxerr {err:.1e}", flush=True)
        except Exception as e:
            print(f"T={t} C={c} s={stride}: FAILED {str(e)[:100]}",
                  flush=True)
            return

    # backward too (value+grad of a sum)
    x = jnp.asarray(rng.standard_normal((64, 300, 33, 64)), jnp.float32)
    ypos = jnp.asarray(rng.uniform(-1, 1, 64), jnp.float32)
    xpos = jnp.zeros(64)
    for name, fn in [("conv", ts.temporal_shift),
                     ("pallas", pk.temporal_shift_pallas)]:
        f = jax.jit(jax.grad(
            lambda xx, yy: jnp.sum(fn(xx, xpos, yy, 1) ** 2),
            argnums=(0, 1)))
        try:
            dt = timeit(f, x, ypos, steps=10)
            print(f"bwd {name}: {dt*1e3:.2f} ms", flush=True)
        except Exception as e:
            print(f"bwd {name}: FAILED {str(e)[:100]}", flush=True)
    print("probe15 complete", flush=True)


if __name__ == "__main__":
    main()
