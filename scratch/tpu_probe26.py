"""Probe 26: bisect the fourstream TPU compile-helper crash (probes 24/25).

Single-stream train compiles fine; the vmapped fourstream step crashes the
remote compile helper (exit 1, no diagnostics) under BOTH spatial impls.
Compile progressively larger pieces to find the culprit.  Each sub-test
runs in THIS process sequentially; compile failures raise JaxRuntimeError
without faulting the worker (compile helper is a separate subprocess).

  nohup bash scratch/run_queue26.sh > scratch/queue26.log 2>&1 &
"""
import os
import sys
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

    from shift_gcn_tpu.graphs import get_graph
    from shift_gcn_tpu.models.shift_gcn import BlockSpec, ModelConfig
    from shift_gcn_tpu.train import fourstream as fs
    from shift_gcn_tpu.train.optim import build_weight_decay_tree

    rng = np.random.default_rng(0)
    graph = get_graph("mediapipe_pose")
    lr = jnp.asarray(0.1, jnp.float32)

    def attempt(tag, fn):
        try:
            t0 = time.perf_counter()
            out = fn()
            jax.block_until_ready(out)
            print(f"{tag}: OK ({time.perf_counter()-t0:.1f}s)", flush=True)
            return True
        except Exception as e:
            print(f"{tag}: FAILED {str(e)[:150]}", flush=True)
            return False

    # 1. raw fgc-1024 depthwise conv (the largest grouped conv in the graph)
    def t1():
        x = jnp.asarray(rng.standard_normal((64, 150, 33, 1024)),
                        jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((18, 1, 1, 1024)), jnp.bfloat16)
        f = jax.jit(lambda xx, kk: jax.lax.conv_general_dilated(
            xx, kk, (1, 1), ((9, 8), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=1024,
            preferred_element_type=jnp.bfloat16))
        return f(x, k)
    attempt("fgc1024 dw conv fwd", t1)

    # 2. vmapped temporal_shift op (fwd+bwd) over 4 streams
    def t2():
        from shift_gcn_tpu.ops.temporal_shift import temporal_shift

        x = jnp.asarray(rng.standard_normal((4, 16, 300, 33, 64)),
                        jnp.bfloat16)
        yp = jnp.asarray(rng.uniform(-1, 1, (4, 64)), jnp.float32)
        xp = jnp.zeros((4, 64), jnp.float32)

        def loss(xx, xpp, ypp):
            return jnp.sum(jax.vmap(
                lambda a_, b_, c_: temporal_shift(a_, b_, c_, 1)
            )(xx, xpp, ypp).astype(jnp.float32) ** 2)

        return jax.jit(jax.grad(loss, argnums=(0, 2)))(x, xp, yp)
    attempt("vmapped temporal_shift fwd+bwd", t2)

    cfg16 = ModelConfig(num_class=2, num_point=33, num_person=1,
                        graph="mediapipe_pose", activation_dtype="bfloat16")
    batch = {"data": jnp.asarray(rng.standard_normal((64, 3, 300, 33, 1)),
                                 jnp.float32),
             "label": jnp.asarray(rng.integers(0, 2, 64), jnp.int32)}

    # 3. fourstream EVAL step (fwd only)
    def t3():
        state4 = fs.create_fourstream_state(jax.random.key(0), cfg16)
        ev = jax.jit(fs.make_fourstream_eval_step(cfg16, graph))
        out = ev(state4.params, state4.bn_state,
                 {"data": batch["data"], "label": batch["label"]})
        return out[1]
    attempt("fourstream eval (fwd only)", t3)

    # 4. fourstream train on a tiny 2-block backbone
    def t4():
        cfg_small = ModelConfig(
            num_class=2, num_point=33, num_person=1, graph="mediapipe_pose",
            activation_dtype="bfloat16",
            blocks=(BlockSpec(3, 16, residual=False),
                    BlockSpec(16, 32, stride=2)))
        state4 = fs.create_fourstream_state(jax.random.key(0), cfg_small)
        wd = build_weight_decay_tree(
            jax.tree_util.tree_map(lambda x: x[0], state4.params))
        step = jax.jit(fs.make_fourstream_train_step(cfg_small, wd, graph))
        return step(state4, batch, lr)[1]["loss"]
    attempt("fourstream train 2-block", t4)

    # 5. fourstream train, full model, batch 16
    def t5():
        small = {"data": batch["data"][:16], "label": batch["label"][:16]}
        state4 = fs.create_fourstream_state(jax.random.key(0), cfg16)
        wd = build_weight_decay_tree(
            jax.tree_util.tree_map(lambda x: x[0], state4.params))
        step = jax.jit(fs.make_fourstream_train_step(cfg16, wd, graph))
        return step(state4, small, lr)[1]["loss"]
    attempt("fourstream train full batch16", t5)

    # 6. fourstream train full, matmul temporal lowering (no dw conv)
    def t6():
        os.environ["SGT_TSHIFT_IMPL"] = "matmul"
        try:
            state4 = fs.create_fourstream_state(jax.random.key(0), cfg16)
            wd = build_weight_decay_tree(
                jax.tree_util.tree_map(lambda x: x[0], state4.params))
            step = jax.jit(fs.make_fourstream_train_step(cfg16, wd, graph))
            return step(state4, batch, lr)[1]["loss"]
        finally:
            os.environ.pop("SGT_TSHIFT_IMPL", None)
    attempt("fourstream train full (matmul tshift)", t6)

    print("probe26 complete", flush=True)


if __name__ == "__main__":
    main()
