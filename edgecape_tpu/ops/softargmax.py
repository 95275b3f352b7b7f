"""Soft-argmax keypoint proposal extraction (global + local-window).

Behavioral spec: reference ProposalGenerator
(models/keypoint_heads/encoder_decoder.py:37-112). TPU redesign: the local
3x3 window re-normalized soft-argmax is computed with a max-pooled one-hot
mask exactly like the reference, but fully batched and without host round
trips; everything stays [B, K, H*W] so XLA maps the reductions onto the VPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pixel_center_grid(h: int, w: int) -> jnp.ndarray:
    """[h, w, 2] grid of (x, y) pixel-center coordinates: 0.5 .. size-0.5."""
    ys = jnp.linspace(0.5, h - 0.5, h, dtype=jnp.float32)
    xs = jnp.linspace(0.5, w - 0.5, w, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys, indexing="xy")
    return jnp.stack([gx, gy], axis=-1)


def global_soft_argmax(similarity: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Full-map softmax soft-argmax, normalized to [0, 1].

    Args:
      similarity: [B, K, h*w] logits.
    Returns:
      [B, K, 2] expected (x, y) / (w, h).
    """
    probs = jax.nn.softmax(similarity, axis=-1)
    grid = pixel_center_grid(h, w).reshape(h * w, 2)
    coords = jnp.einsum("bkp,pc->bkc", probs, grid)
    return coords / jnp.array([w, h], dtype=jnp.float32)


def local_soft_argmax(similarity: jnp.ndarray, h: int, w: int,
                      window: int = 3) -> jnp.ndarray:
    """Re-normalized soft-argmax over a (window x window) patch around the
    argmax, normalized to [0, 1]. Matches reference semantics: probabilities
    come from the *global* softmax, masked to the dilated argmax one-hot and
    re-normalized (encoder_decoder.py:91-110)."""
    b, k, _ = similarity.shape
    probs = jax.nn.softmax(similarity, axis=-1)              # [B, K, hw]
    max_idx = jnp.argmax(similarity, axis=-1)                # [B, K]
    one_hot = jax.nn.one_hot(max_idx, h * w, dtype=jnp.float32)
    # dilate the one-hot with a window x window max-pool
    pad = window // 2
    mask = jax.lax.reduce_window(
        one_hot.reshape(b, k, h, w),
        -jnp.inf, jax.lax.max,
        window_dimensions=(1, 1, window, window),
        window_strides=(1, 1, 1, 1),
        padding=((0, 0), (0, 0), (pad, pad), (pad, pad)),
    ).reshape(b, k, h * w)
    local = probs * mask
    local = local / (local.sum(axis=-1, keepdims=True) + 1e-10)
    grid = pixel_center_grid(h, w).reshape(h * w, 2)
    coords = jnp.einsum("bkp,pc->bkc", local, grid)
    return coords / jnp.array([w, h], dtype=jnp.float32)
