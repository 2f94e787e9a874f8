"""shift_gcn_tpu — a TPU-native skeleton-graph convolution framework.

A from-scratch JAX/XLA/Pallas re-design of the Shift-GCN model family
(reference: austinjeng/Shift-GCN, PyTorch + custom CUDA), built TPU-first:

- functional core: models are pure functions over explicit parameter/state
  pytrees (torch-state-dict-shaped for checkpoint interop),
- channels-last (N, T, V, C) layout throughout the compute path,
- fractional temporal shift as a `jax.custom_vjp` op (optionally a fused
  Pallas kernel) replacing the reference CUDA extension
  (reference: model/Temporal_shift/cuda/shift_cuda_kernel.cu),
- scaling via `jax.sharding.Mesh` + sharding annotations; collectives ride
  ICI (psum grad reduce, ppermute temporal halos) instead of NCCL.
"""

__version__ = "0.1.0"

from shift_gcn_tpu.graphs import get_graph  # noqa: F401
