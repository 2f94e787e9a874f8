"""Probe 29: spatial-transform formulation shootout, standalone per shape.

The dft lowering costs ~59 ms of the 156 ms train step despite ~0.35
TFLOP — overhead (layout/small matmuls), not MACs.  Time each candidate
fwd and fwd+bwd at the three block shapes to find the best composition.

Candidates:
  dft   — current: shared rfft basis matmul + elementwise twiddles
  dft2  — twiddles folded into per-channel / per-output bases
          (einsum "rvc,vfc->rfc" ... "rfd,fvd->rvd"; no elementwise)
  dft3  — shared rfft in, fused twiddle+irfft out
  circ  — circulant conv (control)

  nohup bash scratch/run_queue29.sh > scratch/queue29.log 2>&1 &
"""
import time
import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    a = np.random.default_rng(0).standard_normal((128, 128)).astype(np.float32)
    got = np.asarray(jnp.matmul(jnp.asarray(a), jnp.asarray(a),
                                precision="highest"))
    assert np.allclose(got, a @ a, atol=1e-2)
    print("health ok", flush=True)

    from shift_gcn_tpu.ops import spatial_shift as ss_fn  # noqa: F401
    import importlib

    ss = importlib.import_module("shift_gcn_tpu.ops.spatial_shift")

    v = 33
    f = v // 2 + 1

    def np_factors(c, d):
        vv = np.arange(v)[:, None]
        ff = np.arange(f)[None, :]
        th = 2 * np.pi * vv * ff / v
        fwd_r, fwd_i = np.cos(th), -np.sin(th)
        thc = 2 * np.pi * np.arange(f)[:, None] * np.arange(c)[None, :] / v
        tw1 = np.cos(thc), np.sin(thc)
        thd = 2 * np.pi * np.arange(f)[:, None] * np.arange(d)[None, :] / v
        tw2 = np.cos(thd), -np.sin(thd)
        wgt = np.full((f, 1), 2.0 / v)
        wgt[0, 0] = 1.0 / v
        thv = 2 * np.pi * np.arange(f)[:, None] * np.arange(v)[None, :] / v
        inv_r, inv_i = wgt * np.cos(thv), -wgt * np.sin(thv)
        return (fwd_r.astype(np.float32), fwd_i.astype(np.float32),
                tw1[0].astype(np.float32), tw1[1].astype(np.float32),
                tw2[0].astype(np.float32), tw2[1].astype(np.float32),
                inv_r.astype(np.float32), inv_i.astype(np.float32))

    def make_dft2(c, d, dtype):
        fwd_r, fwd_i, t1r, t1i, t2r, t2i, inv_r, inv_i = np_factors(c, d)
        # B1[v, f, c] complex = w^{-fv} * w^{+fc}; stack re/im on f axis
        b1r = (fwd_r[:, :, None] * t1r[None] - fwd_i[:, :, None] * t1i[None])
        b1i = (fwd_r[:, :, None] * t1i[None] + fwd_i[:, :, None] * t1r[None])
        b1 = jnp.asarray(np.concatenate([b1r, b1i], axis=1), dtype)
        # B2[f2, v, d]: y = zr @ (inv*t2r parts) with complex combine
        # y[v,d] = sum_f [zr*(inv_r*t2r - inv_i*t2i) + zi*(-inv_r*t2i - inv_i*t2r)]
        b2r = (inv_r[:, :, None] * t2r[:, None, :]
               + inv_i[:, :, None] * t2i[:, None, :])
        b2i = (inv_i[:, :, None] * t2r[:, None, :]
               - inv_r[:, :, None] * t2i[:, None, :])
        b2 = jnp.asarray(np.concatenate([b2r, b2i], axis=0), dtype)

        def fn(u, w):
            uh = jnp.einsum("rvc,vfc->rfc", u, b1,
                            preferred_element_type=u.dtype)   # (R, 2F, C)
            z = jnp.einsum("rfc,cd->rfd", uh, w.astype(u.dtype),
                           preferred_element_type=u.dtype)    # (R, 2F, D)
            return jnp.einsum("rfd,fvd->rvd", z, b2,
                              preferred_element_type=u.dtype)
        return fn

    def make_dft3(c, d, dtype):
        fwd_r, fwd_i, t1r, t1i, t2r, t2i, inv_r, inv_i = np_factors(c, d)
        basis = jnp.asarray(np.concatenate([fwd_r, fwd_i], axis=1), dtype)
        t1r_, t1i_ = jnp.asarray(t1r, dtype), jnp.asarray(t1i, dtype)
        b2r = (inv_r[:, :, None] * t2r[:, None, :]
               + inv_i[:, :, None] * t2i[:, None, :])
        b2i = (inv_i[:, :, None] * t2r[:, None, :]
               - inv_r[:, :, None] * t2i[:, None, :])
        b2 = jnp.asarray(np.concatenate([b2r, b2i], axis=0), dtype)

        def fn(u, w):
            uh = jnp.einsum("rvc,vf->rfc", u, basis,
                            preferred_element_type=u.dtype)
            ur, ui = uh[:, :f], uh[:, f:]
            utr = ur * t1r_ - ui * t1i_
            uti = ur * t1i_ + ui * t1r_
            z = jnp.einsum("rfc,cd->rfd",
                           jnp.concatenate([utr, uti], axis=1),
                           w.astype(u.dtype), preferred_element_type=u.dtype)
            return jnp.einsum("rfd,fvd->rvd", z, b2,
                              preferred_element_type=u.dtype)
        return fn

    def make_dft_current(c, d):
        def fn(u, w):
            return ss.shift_gcn_transform_dft(
                u, w, jnp.zeros((d,), jnp.float32),
                jnp.zeros((1, v, c), jnp.float32))
        return fn

    def make_circ(c, d):
        def fn(u, w):
            return ss.shift_gcn_transform_circconv(
                u, w, jnp.zeros((d,), jnp.float32),
                jnp.zeros((1, v, c), jnp.float32))
        return fn

    def timeit(fn, *a, steps=20):
        out = fn(*a)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn(*a)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / steps

    rng = np.random.default_rng(0)
    shapes = [(19200, 64, 64), (9600, 128, 128), (4800, 256, 256)]
    dtype = jnp.bfloat16
    for (r, c, d) in shapes:
        u = jnp.asarray(rng.standard_normal((r, v, c)), dtype)
        w = jnp.asarray(rng.standard_normal((c, d)) * 0.1, jnp.float32)
        cands = {
            "dft ": make_dft_current(c, d),
            "dft2": make_dft2(c, d, dtype),
            "dft3": make_dft3(c, d, dtype),
            "circ": make_circ(c, d),
        }
        ref = None
        for name, fn in cands.items():
            try:
                fwd = jax.jit(fn)
                out = np.asarray(fwd(u, w)).astype(np.float32)
                if ref is None:
                    ref = out
                err = float(np.max(np.abs(out - ref)))
                dt_f = timeit(fwd, u, w)

                def loss(uu, ww):
                    return jnp.sum(fn(uu, ww).astype(jnp.float32) ** 2)

                gr = jax.jit(jax.grad(loss, argnums=(0, 1)))
                dt_g = timeit(lambda *aa: gr(*aa)[0], u, w)
                print(f"R={r} C={c} D={d} {name}: fwd {dt_f*1e3:.2f} ms, "
                      f"fwd+bwd {dt_g*1e3:.2f} ms, err {err:.2e}",
                      flush=True)
            except Exception as e:
                print(f"R={r} C={c} D={d} {name}: FAILED {str(e)[:120]}",
                      flush=True)
    print("probe29 complete", flush=True)


if __name__ == "__main__":
    main()
