"""DETR-style sine positional encodings (grid + continuous-coordinate forms).

Behavioral spec: reference models/utils/positional_encoding.py:57-122
(SinePositionalEncoding.forward / forward_coordinates). Re-expressed in
channels-last jnp with no mask cumsum: the reference mask is always all-valid,
so y_embed/x_embed reduce to (row+1)/H * scale etc., which we compute
directly.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

TEMPERATURE = 10000.0
SCALE = 2.0 * math.pi
EPS = 1e-6


def inverse_sigmoid(x: jnp.ndarray, eps: float = 1e-3) -> jnp.ndarray:
    """Clipped log-odds (reference models/utils/transformer.py
    inverse_sigmoid): the coordinate-trajectory inverse used by the
    flax Decoder AND the Pallas decoder stack — single definition so
    the two cannot drift."""
    x = jnp.clip(x, 0.0, 1.0)
    x1 = jnp.clip(x, eps, None)
    x2 = jnp.clip(1.0 - x, eps, None)
    return jnp.log(x1 / x2)


def _dim_t(num_feats: int) -> jnp.ndarray:
    i = jnp.arange(num_feats, dtype=jnp.float32)
    return TEMPERATURE ** (2.0 * jnp.floor(i / 2.0) / num_feats)


def _interleave_sin_cos(pos: jnp.ndarray) -> jnp.ndarray:
    """pos [..., num_feats] -> [..., num_feats] with
    (sin(p0), cos(p1), sin(p2), cos(p3), ...)."""
    s = jnp.sin(pos[..., 0::2])
    c = jnp.cos(pos[..., 1::2])
    return jnp.stack([s, c], axis=-1).reshape(*pos.shape[:-1], -1)


def sine_grid(h: int, w: int, num_feats: int = 128) -> jnp.ndarray:
    """[h, w, 2*num_feats] sine positional map (normalize=True semantics).

    Equals the reference forward() with an all-zero mask: cumsum over a
    ones-mask gives y_embed[r] = r+1, normalized by the last row (h), offset
    0, scaled by 2*pi.
    """
    y = (jnp.arange(h, dtype=jnp.float32) + 1.0) / (h + EPS) * SCALE
    x = (jnp.arange(w, dtype=jnp.float32) + 1.0) / (w + EPS) * SCALE
    dim_t = _dim_t(num_feats)
    pos_y = _interleave_sin_cos(y[:, None, None] / dim_t)        # [h,1,F]
    pos_x = _interleave_sin_cos(x[None, :, None] / dim_t)        # [1,w,F]
    pos_y = jnp.broadcast_to(pos_y, (h, w, num_feats))
    pos_x = jnp.broadcast_to(pos_x, (h, w, num_feats))
    return jnp.concatenate([pos_y, pos_x], axis=-1)              # [h,w,2F]


def sine_coords(coords: jnp.ndarray, num_feats: int = 128) -> jnp.ndarray:
    """Continuous-coordinate sine embedding.

    Args:
      coords: [..., 2] normalized (x, y) in [0, 1].
    Returns:
      [..., 2*num_feats] embedding, ordered (y-feats, x-feats) like the
      reference forward_coordinates (positional_encoding.py:96-122).
    """
    # fp32 internally: bf16 callers (head_dtype fast path) would lose
    # coordinate resolution inside the 2*pi scaling and division
    coords = coords.astype(jnp.float32)
    x = coords[..., 0] * SCALE
    y = coords[..., 1] * SCALE
    dim_t = _dim_t(num_feats)
    pos_x = _interleave_sin_cos(x[..., None] / dim_t)
    pos_y = _interleave_sin_cos(y[..., None] / dim_t)
    return jnp.concatenate([pos_y, pos_x], axis=-1)
