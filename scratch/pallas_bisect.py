"""Bisect the pallas-in-model compile crash: ONE case per process.

Usage: python scratch/pallas_bisect.py <case>

Each case jits a composition one notch bigger than the last; the first
crashing case names the guilty pairing.  Run cases in separate processes
(platform: first failure per process only; later failures cascade).
"""
import sys
import numpy as np

V, CIN, COUT = 33, 64, 64
ROWS = 4 * 300  # n*t rows like the real model


def main(case):
    import jax
    import jax.numpy as jnp
    print("health:", float((jnp.ones((8, 8)) @ jnp.ones((8, 8))).sum()),
          flush=True)
    from shift_gcn_tpu.ops.pallas.shift_gcn_kernel import fused_shift_gcn
    from shift_gcn_tpu.ops.batchnorm import batch_norm, init_bn

    rng = np.random.default_rng(0)
    x4 = jnp.asarray(rng.standard_normal((4, 300, V, CIN)), jnp.float32)
    gate = jnp.asarray(rng.standard_normal((V, CIN)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((CIN, COUT)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal((COUT,)), jnp.float32)
    bn_p, bn_s = init_bn(V * COUT)

    def kern(x3):
        return fused_shift_gcn(x3, gate, w, b)

    if case == "standalone":
        f = lambda: jax.jit(kern)(x4.reshape(ROWS, V, CIN))
    elif case == "reshape_in":
        def g(x):
            n, t, v, c = x.shape
            h = kern(x.reshape(n * t, v, c))
            return h.reshape(n, t, v, -1)
        f = lambda: jax.jit(g)(x4)
    elif case == "bn_const_after":
        def g(x):
            n, t, v, c = x.shape
            h = kern(x.reshape(n * t, v, c)).reshape(n, t, v, -1)
            return (h - 0.1) * jax.lax.rsqrt(jnp.asarray(1.5)) + 0.2
        f = lambda: jax.jit(g)(x4)
    elif case == "bn_vec_after":
        # per-(V,C) affine with vector constants — eval-mode BN shape
        scale = jnp.asarray(rng.standard_normal((V, COUT)), jnp.float32)
        shift = jnp.asarray(rng.standard_normal((V, COUT)), jnp.float32)
        def g(x):
            n, t, v, c = x.shape
            h = kern(x.reshape(n * t, v, c)).reshape(n, t, v, -1)
            return h * scale + shift
        f = lambda: jax.jit(g)(x4)
    elif case == "bn_real_after":
        def g(x):
            n, t, v, c = x.shape
            h = kern(x.reshape(n * t, v, c)).reshape(n, t, v, -1)
            h, _ = batch_norm(h, bn_p, bn_s, reduce_axes=(0, 1),
                              training=False)
            return h
        f = lambda: jax.jit(g)(x4)
    elif case == "relu_add":
        def g(x):
            n, t, v, c = x.shape
            h = kern(x.reshape(n * t, v, c)).reshape(n, t, v, -1)
            return jax.nn.relu(h + x)
        f = lambda: jax.jit(g)(x4)
    elif case == "transpose_in":
        # data_bn-style preamble: 5D transpose/reshape chain into the kernel
        x5 = jnp.asarray(rng.standard_normal((4, 3, 300, V, 1)), jnp.float32)
        win = jnp.asarray(rng.standard_normal((3, COUT)) * 0.1, jnp.float32)
        gate3 = jnp.asarray(rng.standard_normal((V, 3)), jnp.float32)
        def g(x):
            n, c, t, v, m = x.shape
            h = jnp.transpose(x, (0, 4, 3, 1, 2)).reshape(n, m * v * c, t)
            h = jnp.transpose(h, (0, 2, 1)).reshape(n, t, m, v, c)
            h = jnp.transpose(h, (0, 2, 1, 3, 4)).reshape(n * m, t, v, c)
            out = fused_shift_gcn(h.reshape(n * m * t, v, c), gate3, win,
                                  jnp.zeros((COUT,), jnp.float32))
            return out.reshape(n * m, t, v, -1)
        f = lambda: jax.jit(g)(x5)
    elif case == "two_kernels":
        gate2 = jnp.asarray(rng.standard_normal((V, COUT)), jnp.float32)
        w2 = jnp.asarray(rng.standard_normal((COUT, COUT)) * 0.1, jnp.float32)
        def g(x):
            n, t, v, c = x.shape
            h = kern(x.reshape(n * t, v, c))
            h = fused_shift_gcn(h, gate2, w2, b)
            return h.reshape(n, t, v, -1)
        f = lambda: jax.jit(g)(x4)
    elif case == "tconv_after":
        from shift_gcn_tpu.ops.conv import pointwise_conv
        wc = jnp.asarray(rng.standard_normal((COUT, COUT, 1, 1)) * 0.1,
                         jnp.float32)
        bc = jnp.zeros((COUT,), jnp.float32)
        def g(x):
            n, t, v, c = x.shape
            h = kern(x.reshape(n * t, v, c)).reshape(n, t, v, -1)
            return pointwise_conv(h, wc, bc)
        f = lambda: jax.jit(g)(x4)
    elif case == "gcn_block":
        from shift_gcn_tpu.models.shift_gcn import (
            _apply_shift_gcn, _init_shift_gcn)
        p, s = _init_shift_gcn(jax.random.key(0), CIN, COUT, V)
        def g(x):
            h, _ = _apply_shift_gcn(p, s, x, training=False, axis_name=None,
                                    compute_dtype=None, use_pallas=True)
            return h
        f = lambda: jax.jit(g)(x4)
    elif case == "full_block":
        from shift_gcn_tpu.models.shift_gcn import (
            BlockSpec, _apply_block, _init_shift_gcn, _init_shift_tcn)
        spec = BlockSpec(CIN, COUT)
        from shift_gcn_tpu.models import shift_gcn as m
        kp = jax.random.split(jax.random.key(0), 2)
        gcn_p, gcn_s = _init_shift_gcn(kp[0], CIN, COUT, V)
        tcn_p, tcn_s = _init_shift_tcn(kp[1], COUT, COUT, 1.0)
        p = {"gcn1": gcn_p, "tcn1": tcn_p}
        s = {"gcn1": gcn_s, "tcn1": tcn_s}
        def g(x):
            h, _ = _apply_block(p, s, x, spec, training=False,
                                axis_name=None, compute_dtype=None,
                                use_pallas=True)
            return h
        f = lambda: jax.jit(g)(x4)
    else:
        raise SystemExit(f"unknown case {case}")

    out = f()
    import jax
    jax.block_until_ready(out)
    print(f"case {case}: OK "
          f"{np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:2]}",
          flush=True)


if __name__ == "__main__":
    main(sys.argv[1])
