"""Skeleton-graph adjacency utilities (batched, static-shape, jit-able).

Behavioral spec: reference models/keypoint_heads/skeleton.py:152-205
(adjacency construction, normalization, Markov hop powers). TPU-first
redesign: edge lists are rasterized host-side into fixed [K, K] binary
matrices (variable-length edge lists never reach the device), everything
else is batched jnp with masks.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def adjacency_from_edges(edges, num_pts: int) -> np.ndarray:
    """Host-side: edge list [[i, j], ...] -> symmetric binary [K, K]."""
    adj = np.zeros((num_pts, num_pts), dtype=np.float32)
    edges = np.asarray(edges, dtype=np.int64).reshape(-1, 2) if len(edges) \
        else np.zeros((0, 2), dtype=np.int64)
    for i, j in edges:
        if 0 <= i < num_pts and 0 <= j < num_pts:
            adj[i, j] = 1.0
            adj[j, i] = 1.0
    return adj


def normalize_adjacency(binary_adj: jnp.ndarray,
                        kp_invalid: jnp.ndarray) -> jnp.ndarray:
    """GT-adjacency normalization (reference normalize_adj, skeleton.py:187-194).

    Args:
      binary_adj: [..., K, K] symmetric binary adjacency.
      kp_invalid: [..., K] bool, True for padded/invisible keypoints.
    Returns:
      [..., 2, K, K]: slice 0 = diag(valid), slice 1 = masked row-normalized
      adjacency (zero rows stay zero).
    """
    valid = (~kp_invalid).astype(binary_adj.dtype)
    adj = binary_adj * valid[..., :, None] * valid[..., None, :]
    row_sum = adj.sum(axis=-1, keepdims=True)
    adj = jnp.where(row_sum > 0, adj / jnp.where(row_sum > 0, row_sum, 1.0),
                    0.0)
    eye = jnp.eye(binary_adj.shape[-1], dtype=binary_adj.dtype)
    diag = eye * valid[..., None, :]
    return jnp.stack([diag, adj], axis=-3)


def soft_normalize_adjacency(adj: jnp.ndarray, kp_invalid: jnp.ndarray,
                             *, normalize: bool = True,
                             stack_diag: bool = True) -> jnp.ndarray:
    """Soft row-normalization for continuous adjacency (reference
    soft_normalize_adj, skeleton.py:196-205): mask, divide by row-sum + 1e-8,
    optionally stack with diag(valid)."""
    valid = (~kp_invalid).astype(adj.dtype)
    adj = adj * valid[..., :, None] * valid[..., None, :]
    if normalize:
        adj = adj / (adj.sum(axis=-1, keepdims=True) + 1e-8)
    if not stack_diag:
        return adj
    eye = jnp.eye(adj.shape[-1], dtype=adj.dtype)
    diag = eye * valid[..., None, :]
    return jnp.stack([diag, adj], axis=-3)


def markov_hop_stack(adj: jnp.ndarray, max_hop: int) -> jnp.ndarray:
    """Row-stochastic transition-matrix powers 0..max_hop.

    Reference markov_transition_matrix (skeleton.py:152-161). Returned
    channels-last as [..., K, K, max_hop+1] so the per-(i, j) hop vector is
    contiguous for the bias MLP. fp32 accumulation (power products are
    sensitive to precision).
    """
    adj = adj.astype(jnp.float32)
    adj = adj / (adj.sum(axis=-1, keepdims=True) + 1e-8)
    k = adj.shape[-1]
    powers = [jnp.broadcast_to(jnp.eye(k, dtype=jnp.float32), adj.shape)]
    for _ in range(max_hop):
        powers.append(
            jnp.matmul(powers[-1], adj, preferred_element_type=jnp.float32))
    return jnp.stack(powers, axis=-1)
