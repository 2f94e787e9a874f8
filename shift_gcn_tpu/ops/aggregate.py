"""Generic graph aggregation ops (adaptive-adjacency SpMM).

The Shift-GCN blocks never multiply by the adjacency, but the framework's
message-passing generality (dense per-subset aggregation a la ST-GCN/AGCN,
plus a sparse edge-list path suitable for edge partitioning across hosts)
lives here.  V is tiny (25/33), so the dense path is a batched matmul that
maps straight onto the MXU; the sparse path exists for the multi-host
edge-partitioned pipeline where many clips' graphs are batched into one
block-diagonal problem.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp


def dense_graph_aggregate(
    x: jax.Array,
    adjacency: jax.Array,
    weight: Optional[jax.Array] = None,
) -> jax.Array:
    """Dense multi-subset aggregation: out[..., v, d] = sum_k sum_u A[k,v,u] (x W_k)[..., u, d].

    Args:
      x: (..., V, C_in).
      adjacency: (K, V, V) subset stack (e.g. I / inward / outward).
      weight: optional (K, C_in, C_out) per-subset projection.

    Returns:
      (..., V, C_out) (C_out = C_in when weight is None).
    """
    if weight is None:
        return jnp.einsum("kvu,...uc->...vc", adjacency, x,
                          preferred_element_type=jnp.float32)
    h = jnp.einsum("...uc,kcd->k...ud", x, weight,
                   preferred_element_type=jnp.float32)
    return jnp.einsum("kvu,k...ud->...vd", adjacency, h,
                      preferred_element_type=jnp.float32)


def edge_aggregate(
    x: jax.Array,
    edges: Dict[str, jax.Array],
    num_nodes: int,
) -> jax.Array:
    """Sparse COO aggregation via gather + segment-sum.

    out[..., dst, c] += weight_e * x[..., src_e, c] for each edge e.

    Args:
      x: (..., V, C) node features (leading batch dims allowed).
      edges: dict with int32 ``src``/``dst`` (E,) and float ``weight`` (E,).
      num_nodes: V.

    Returns:
      (..., V, C) aggregated features.
    """
    src = edges["src"]
    dst = edges["dst"]
    w = edges["weight"]
    gathered = jnp.take(x, src, axis=-2)  # (..., E, C)
    gathered = gathered * w[..., :, None]
    # segment-sum over the destination axis; move edge axis to front for
    # jax.ops.segment_sum which reduces axis 0.
    moved = jnp.moveaxis(gathered, -2, 0)  # (E, ..., C)
    summed = jax.ops.segment_sum(moved, dst, num_segments=num_nodes)
    return jnp.moveaxis(summed, 0, -2)


def sddmm(
    a: jax.Array,
    b: jax.Array,
    edges: Dict[str, jax.Array],
) -> jax.Array:
    """Sampled dense-dense matmul: per-edge scores from node embeddings.

    score_e = <a[..., src_e, :], b[..., dst_e, :]> for each COO edge — the
    op that closes the adaptive-adjacency loop (SpMM aggregates with the
    edge weights, SDDMM produces/updates them from data; cf. the learned
    data-dependent adjacency of AGCN-style models, which the reference
    inherits vestigially via its unused `A` buffers, model/shift_gcn.py:78).

    On TPU this lowers to two gathers + a lane reduction (VPU); for the
    tiny skeleton graphs (E<=40) the cost is negligible next to the
    (V, C) matmuls, so no Pallas kernel is warranted.

    Args:
      a: (..., V, C) source-side embeddings.
      b: (..., V, C) destination-side embeddings.
      edges: dict with int32 ``src``/``dst`` (E,).

    Returns:
      (..., E) per-edge scores.
    """
    ga = jnp.take(a, edges["src"], axis=-2)  # (..., E, C)
    gb = jnp.take(b, edges["dst"], axis=-2)  # (..., E, C)
    return jnp.sum(ga * gb, axis=-1)


def sddmm_dense(
    a: jax.Array,
    b: jax.Array,
    mask: jax.Array,
) -> jax.Array:
    """Dense-masked SDDMM: (A @ B^T) * mask, for when the score matrix is
    consumed as a dense (V, V) adjacency anyway (V is 25/33 here, so the
    full product is one small MXU matmul and the 'sampling' is a select).

    Args:
      a: (..., V, C); b: (..., V, C); mask: (V, V) 0/1 sparsity pattern.

    Returns:
      (..., V, V) masked score matrix.
    """
    scores = jnp.einsum("...vc,...uc->...vu", a, b,
                        preferred_element_type=jnp.float32)
    return scores * mask


def edge_aggregate_onehot(
    x: jax.Array,
    edges: Dict[str, jax.Array],
    num_nodes: int,
) -> jax.Array:
    """Same contraction as `edge_aggregate` but materialized as a dense
    (V, V) matmul — on TPU this is usually faster for small V since it runs
    on the MXU instead of scatter hardware."""
    mat = jnp.zeros((num_nodes, num_nodes), dtype=x.dtype)
    mat = mat.at[edges["dst"], edges["src"]].add(edges["weight"])
    return jnp.einsum("vu,...uc->...vc", mat, x,
                      preferred_element_type=jnp.float32)
