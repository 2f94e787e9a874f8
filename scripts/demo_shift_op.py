"""Smoke demo of the learnable fractional temporal-shift op.

TPU-native equivalent of the reference's CUDA-extension demo
(model/Temporal_shift/demo.py:13-29 + run.sh): run forward and backward on
a tiny ones tensor and print outputs and gradients — including the
constraint backward's fixed-magnitude ypos steps (|grad_ypos| == 0.01,
reference shift_cuda_kernel.cu:370-395) and the zeroed xpos gradient.

Usage: python scripts/demo_shift_op.py [--stride 1]
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--stride", type=int, default=1, choices=(1, 2))
    parser.add_argument("--cpu", action="store_true",
                        help="force CPU (skip the attached accelerator)")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from shift_gcn_tpu.ops.temporal_shift import temporal_shift

    # reference demo shape: ones(1, 5, 8, 4) in (N, C, H=T, W=V) — ours is
    # channels-last (N, T, V, C)
    n, t, v, c = 1, 8, 4, 5
    x = jnp.ones((n, t, v, c), jnp.float32)
    xpos = jnp.zeros((c,), jnp.float32)
    ypos = jnp.asarray(np.linspace(-1.0, 1.0, c), jnp.float32)

    out = jax.jit(
        lambda x, xp, yp: temporal_shift(x, xp, yp, args.stride)
    )(x, xpos, ypos)
    print(f"device: {list(out.devices())[0]}")
    print(f"forward out shape: {out.shape}")
    print("out[0, :, 0, :] =")
    print(np.asarray(out[0, :, 0, :]))

    def loss(x, xpos, ypos):
        return jnp.sum(temporal_shift(x, xpos, ypos, args.stride) ** 2)

    gx, gxp, gyp = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(x, xpos, ypos)
    print(f"grad_input norm: {float(jnp.linalg.norm(gx)):.4f}")
    print(f"grad_xpos (always zero): {np.asarray(gxp)}")
    print(f"grad_ypos (fixed ±0.01 steps): {np.asarray(gyp)}")


if __name__ == "__main__":
    main()
