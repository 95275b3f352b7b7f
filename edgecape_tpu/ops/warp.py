"""On-device batched affine image warping (crop + resize + normalize fused).

TPU-native replacement for the reference's cv2.warpAffine host preprocessing
(top_down_transform.py:47-58): a batch of images is resampled on device with
bilinear interpolation from per-sample inverse affine matrices, fused by XLA
with the subsequent ImageNet normalization — no per-image host work beyond
the 2x3 matrix solve (ops/affine.py).

cv2.warpAffine(INTER_LINEAR) semantics: dst(x, y) = bilinear(src, M_inv @
(x, y, 1)) with zero padding outside; sampling positions are pixel *indices*
(not centers), matching cv2's convention.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


def invert_affine(mat: np.ndarray) -> np.ndarray:
    """Invert a 2x3 affine (dst->src matrix from a src->dst one)."""
    A = np.asarray(mat, dtype=np.float64)
    Ainv = np.linalg.inv(np.vstack([A, [0.0, 0.0, 1.0]]))
    return Ainv[:2]


def _bilinear_sample_one(img: jnp.ndarray, src_xy: jnp.ndarray) -> jnp.ndarray:
    """img [H, W, C], src_xy [h, w, 2] -> [h, w, C]; zero padding outside."""
    H, W = img.shape[0], img.shape[1]
    x = src_xy[..., 0]
    y = src_xy[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def gather(yi, xi):
        inside = ((xi >= 0) & (xi <= W - 1) & (yi >= 0)
                  & (yi <= H - 1))[..., None]
        xi_c = jnp.clip(xi, 0, W - 1)
        yi_c = jnp.clip(yi, 0, H - 1)
        return img[yi_c, xi_c] * inside

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x0i + 1)
    v10 = gather(y0i + 1, x0i)
    v11 = gather(y0i + 1, x0i + 1)
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy


def warp_affine_batch(images: jnp.ndarray, inv_mats: jnp.ndarray,
                      out_hw: tuple[int, int],
                      normalize: bool = True) -> jnp.ndarray:
    """Batched affine warp + optional ImageNet normalization.

    Args:
      images: [B, H, W, 3] uint8 or float (0..255).
      inv_mats: [B, 2, 3] dst->src affine matrices (see invert_affine).
      out_hw: (h, w) output size.
      normalize: scale to [0,1] then ImageNet mean/std.

    Returns:
      [B, h, w, 3] float32.
    """
    h, w = out_hw
    gx, gy = jnp.meshgrid(jnp.arange(w, dtype=jnp.float32),
                          jnp.arange(h, dtype=jnp.float32), indexing="xy")
    dst = jnp.stack([gx, gy, jnp.ones_like(gx)], axis=-1)  # [h, w, 3]

    def warp_one(img, m):
        src_xy = dst @ m.T  # [h, w, 2]
        return _bilinear_sample_one(img.astype(jnp.float32), src_xy)

    out = jax.vmap(warp_one)(images, inv_mats.astype(jnp.float32))
    if normalize:
        out = (out / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    return out
