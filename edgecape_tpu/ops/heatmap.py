"""Gaussian keypoint-heatmap rendering.

Behavioral spec comes from the reference MSRA/UDP target generators
(/root/reference/EdgeCape/datasets/pipelines/top_down_transform.py:113-320),
but the implementation is fully vectorized over keypoints (numpy host path)
and batched/jit-able over episodes (jnp device path) — no per-joint Python
loops, no dynamic windows: the truncated gaussian is a closed-form masked
expression, which XLA fuses into a single elementwise kernel.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _msra_centers(joints_xy: np.ndarray, feat_stride: np.ndarray) -> np.ndarray:
    # int(v + 0.5) in the reference truncates toward zero after adding 0.5.
    return np.trunc(joints_xy / feat_stride + 0.5).astype(np.int64)


def render_msra(joints_xy, visible, heatmap_size, image_size, sigma: float):
    """MSRA truncated-gaussian targets, vectorized.

    Args:
      joints_xy: [K, 2] keypoint coords in input-image pixels.
      visible: [K] visibility (>0 means labeled).
      heatmap_size: (W, H).
      image_size: (W, H) of the model input.
      sigma: gaussian sigma in heatmap pixels.

    Returns:
      target [K, H, W] float32, weight [K, 1] float32.

    Semantics mirrored from the reference (top_down_transform.py:164-199):
    center snapped to int(x/stride + 0.5); gaussian truncated to a
    (6*sigma+1)^2 window with peak value 1; weight zeroed when the window
    falls fully outside the map.
    """
    W, H = int(heatmap_size[0]), int(heatmap_size[1])
    joints_xy = np.asarray(joints_xy, dtype=np.float32)
    K = joints_xy.shape[0]
    feat_stride = np.asarray(image_size, dtype=np.float32) / np.array(
        [W, H], dtype=np.float32)
    tmp_size = sigma * 3

    mu = _msra_centers(joints_xy[:, :2], feat_stride)  # [K, 2] int
    # reference window bounds: int() truncation toward zero of mu -/+ ts —
    # matters when 3*sigma is fractional (asymmetric window, and the
    # gaussian anchors at ul + (2*ts+1)//2 rather than at mu)
    ul = np.trunc(mu - tmp_size)
    br = np.trunc(mu + tmp_size + 1)
    in_bounds = ~((ul[:, 0] >= W) | (ul[:, 1] >= H) | (br[:, 0] < 0)
                  | (br[:, 1] < 0))

    weight = (np.asarray(visible, dtype=np.float32).reshape(K)
              * in_bounds.astype(np.float32)).reshape(K, 1)

    x0 = (2.0 * tmp_size + 1.0) // 2.0
    center = ul + x0                                      # [K, 2]
    xs = np.arange(W, dtype=np.float32)[None, None, :]   # [1, 1, W]
    ys = np.arange(H, dtype=np.float32)[None, :, None]   # [1, H, 1]
    dx = xs - center[:, 0].astype(np.float32)[:, None, None]
    dy = ys - center[:, 1].astype(np.float32)[:, None, None]
    g = np.exp(-(dx * dx + dy * dy) / (2.0 * sigma * sigma))
    window = ((xs >= ul[:, 0][:, None, None])
              & (xs < br[:, 0][:, None, None])
              & (ys >= ul[:, 1][:, None, None])
              & (ys < br[:, 1][:, None, None]))
    draw = (weight[:, 0] > 0.5)[:, None, None]
    target = (g * window * draw).astype(np.float32)
    return target, weight.astype(np.float32)


def render_msra_jnp(joints_xy, visible, heatmap_size, image_size,
                    sigma: float):
    """Device/batched version of render_msra.

    Args:
      joints_xy: [..., K, 2], visible: [..., K]. Returns
      (target [..., K, H, W], weight [..., K, 1]).
    """
    W, H = int(heatmap_size[0]), int(heatmap_size[1])
    feat_stride = jnp.asarray(image_size, dtype=jnp.float32) / jnp.array(
        [W, H], dtype=jnp.float32)
    tmp_size = sigma * 3

    mu = jnp.trunc(joints_xy / feat_stride + 0.5)  # [..., K, 2]
    ul = jnp.trunc(mu - tmp_size)
    br = jnp.trunc(mu + tmp_size + 1)
    in_bounds = ~((ul[..., 0] >= W) | (ul[..., 1] >= H) | (br[..., 0] < 0)
                  | (br[..., 1] < 0))
    weight = visible.astype(jnp.float32) * in_bounds.astype(jnp.float32)

    x0 = (2.0 * tmp_size + 1.0) // 2.0
    center = ul + x0
    xs = jnp.arange(W, dtype=jnp.float32)
    ys = jnp.arange(H, dtype=jnp.float32)
    dx = xs[None, :] - center[..., 0][..., None, None]   # [..., K, 1, W] bc
    dy = ys[:, None] - center[..., 1][..., None, None]   # [..., K, H, 1]
    g = jnp.exp(-(dx * dx + dy * dy) / (2.0 * sigma * sigma))
    window = ((xs[None, :] >= ul[..., 0][..., None, None])
              & (xs[None, :] < br[..., 0][..., None, None])
              & (ys[:, None] >= ul[..., 1][..., None, None])
              & (ys[:, None] < br[..., 1][..., None, None]))
    draw = (weight > 0.5)[..., None, None]
    target = g * window * draw
    return target.astype(jnp.float32), weight[..., None]


def render_udp(joints_xy, visible, heatmap_size, image_size, sigma: float):
    """UDP GaussianHeatMap targets (reference top_down_transform.py:244-286):
    continuous sub-pixel center, stride (size-1)/(hsize-1)."""
    W, H = int(heatmap_size[0]), int(heatmap_size[1])
    joints_xy = np.asarray(joints_xy, dtype=np.float32)
    K = joints_xy.shape[0]
    feat_stride = ((np.asarray(image_size, dtype=np.float32) - 1.0)
                   / (np.array([W, H], dtype=np.float32) - 1.0))
    tmp_size = sigma * 3

    mu_ac = joints_xy[:, :2] / feat_stride          # continuous center
    mu = np.trunc(mu_ac + 0.5)                      # snapped (window anchor)
    ul = np.trunc(mu - tmp_size)
    br = np.trunc(mu + tmp_size + 1)
    in_bounds = ~((ul[:, 0] >= W) | (ul[:, 1] >= H) | (br[:, 0] < 0)
                  | (br[:, 1] < 0))
    weight = (np.asarray(visible, dtype=np.float32).reshape(K)
              * in_bounds.astype(np.float32)).reshape(K, 1)

    # reference gaussian anchor (top_down_transform.py:262-268):
    # x0 = size//2 + (mu_ac - mu) relative to ul
    x0 = (2.0 * tmp_size + 1.0) // 2.0
    center = ul + x0 + (mu_ac - mu)
    xs = np.arange(W, dtype=np.float32)[None, None, :]
    ys = np.arange(H, dtype=np.float32)[None, :, None]
    dx = xs - center[:, 0][:, None, None]
    dy = ys - center[:, 1][:, None, None]
    g = np.exp(-(dx * dx + dy * dy) / (2.0 * sigma * sigma))
    window = ((xs >= ul[:, 0][:, None, None])
              & (xs < br[:, 0][:, None, None])
              & (ys >= ul[:, 1][:, None, None])
              & (ys < br[:, 1][:, None, None]))
    draw = (weight[:, 0] > 0.5)[:, None, None]
    target = (g * window * draw).astype(np.float32)
    return target, weight.astype(np.float32)


def render_msra_unbiased(joints_xy, visible, heatmap_size, image_size,
                         sigma: float):
    """MSRA targets with `unbiased_encoding=True` (Dark-pose style;
    reference top_down_transform.py:140-163): the gaussian is centered at
    the CONTINUOUS sub-pixel coordinate, drawn over the full map (no
    window truncation), and the in-bounds check uses float window bounds
    (no int() snapping).

    Args/returns match render_msra.
    """
    W, H = int(heatmap_size[0]), int(heatmap_size[1])
    joints_xy = np.asarray(joints_xy, dtype=np.float32)
    K = joints_xy.shape[0]
    feat_stride = np.asarray(image_size, dtype=np.float32) / np.array(
        [W, H], dtype=np.float32)
    tmp_size = sigma * 3

    mu = joints_xy[:, :2] / feat_stride               # [K, 2] continuous
    ul = mu - tmp_size                                # float bounds
    br = mu + tmp_size + 1
    in_bounds = ~((ul[:, 0] >= W) | (ul[:, 1] >= H) | (br[:, 0] < 0)
                  | (br[:, 1] < 0))
    weight = (np.asarray(visible, dtype=np.float32).reshape(K)
              * in_bounds.astype(np.float32)).reshape(K, 1)

    xs = np.arange(W, dtype=np.float32)[None, None, :]
    ys = np.arange(H, dtype=np.float32)[None, :, None]
    dx = xs - mu[:, 0][:, None, None]
    dy = ys - mu[:, 1][:, None, None]
    g = np.exp(-(dx * dx + dy * dy) / (2.0 * sigma * sigma))
    draw = (weight[:, 0] > 0.5)[:, None, None]
    return (g * draw).astype(np.float32), weight.astype(np.float32)


def render_msra_unbiased_jnp(joints_xy, visible, heatmap_size, image_size,
                             sigma: float):
    """Device/batched version of render_msra_unbiased.
    joints_xy [..., K, 2], visible [..., K] ->
    (target [..., K, H, W], weight [..., K, 1])."""
    W, H = int(heatmap_size[0]), int(heatmap_size[1])
    feat_stride = jnp.asarray(image_size, dtype=jnp.float32) / jnp.array(
        [W, H], dtype=jnp.float32)
    tmp_size = sigma * 3

    mu = joints_xy / feat_stride
    ul = mu - tmp_size
    br = mu + tmp_size + 1
    in_bounds = ~((ul[..., 0] >= W) | (ul[..., 1] >= H) | (br[..., 0] < 0)
                  | (br[..., 1] < 0))
    weight = visible.astype(jnp.float32) * in_bounds.astype(jnp.float32)

    xs = jnp.arange(W, dtype=jnp.float32)
    ys = jnp.arange(H, dtype=jnp.float32)
    dx = xs[None, :] - mu[..., 0][..., None, None]
    dy = ys[:, None] - mu[..., 1][..., None, None]
    g = jnp.exp(-(dx * dx + dy * dy) / (2.0 * sigma * sigma))
    draw = (weight > 0.5)[..., None, None]
    return (g * draw).astype(jnp.float32), weight[..., None]


def render_msra_multi(joints_xy, visible, heatmap_size, image_size, sigmas):
    """Multi-sigma MSRA stacking (reference top_down_transform.py:330-345):
    targets [S, K, H, W] and weights [S, K, 1], one slice per sigma."""
    ts, ws = zip(*(render_msra(joints_xy, visible, heatmap_size,
                               image_size, float(s)) for s in sigmas))
    return np.stack(ts, axis=0), np.stack(ws, axis=0)


def render_udp_combined(joints_xy, visible, heatmap_size, image_size,
                        valid_radius_factor: float = 0.0546875):
    """UDP CombinedTarget (reference top_down_transform.py:286-315):
    per joint a classification disc plus x/y offset maps, all computed
    at the UDP sub-pixel center.

    Returns (target [K*3, H, W] float32, weight [K, 1] float32); channel
    layout per joint is [response, x_offset, y_offset], matching the
    reference's reshape(num_joints*3, H, W).
    """
    W, H = int(heatmap_size[0]), int(heatmap_size[1])
    joints_xy = np.asarray(joints_xy, dtype=np.float32)
    K = joints_xy.shape[0]
    feat_stride = ((np.asarray(image_size, dtype=np.float32) - 1.0)
                   / (np.array([W, H], dtype=np.float32) - 1.0))
    valid_radius = valid_radius_factor * H

    mu = joints_xy[:, :2] / feat_stride                    # [K, 2] cont.
    xs = np.arange(W, dtype=np.float32)[None, None, :]     # [1, 1, W]
    ys = np.arange(H, dtype=np.float32)[None, :, None]     # [1, H, 1]
    x_off = (mu[:, 0][:, None, None] - xs) / valid_radius  # [K, H, W]
    y_off = (mu[:, 1][:, None, None] - ys) / valid_radius
    keep = (x_off ** 2 + y_off ** 2) <= 1.0
    weight = np.asarray(visible, dtype=np.float32).reshape(K, 1)
    draw = (weight[:, 0] > 0.5)[:, None, None] & keep
    target = np.stack([draw.astype(np.float32),
                       np.where(draw, x_off, 0.0),
                       np.where(draw, y_off, 0.0)], axis=1)  # [K, 3, H, W]
    return target.reshape(K * 3, H, W).astype(np.float32), weight


def render_udp_jnp(joints_xy, visible, heatmap_size, image_size,
                   sigma: float):
    """Device/batched UDP GaussianHeatMap rendering (mirrors render_udp):
    continuous sub-pixel gaussian center, window anchored at the snapped
    integer center. joints_xy [..., K, 2], visible [..., K]."""
    W, H = int(heatmap_size[0]), int(heatmap_size[1])
    feat_stride = ((jnp.asarray(image_size, dtype=jnp.float32) - 1.0)
                   / (jnp.array([W, H], dtype=jnp.float32) - 1.0))
    tmp_size = sigma * 3

    mu_ac = joints_xy / feat_stride
    mu = jnp.trunc(mu_ac + 0.5)
    ul = jnp.trunc(mu - tmp_size)
    br = jnp.trunc(mu + tmp_size + 1)
    in_bounds = ~((ul[..., 0] >= W) | (ul[..., 1] >= H) | (br[..., 0] < 0)
                  | (br[..., 1] < 0))
    weight = visible.astype(jnp.float32) * in_bounds.astype(jnp.float32)

    x0 = (2.0 * tmp_size + 1.0) // 2.0
    center = ul + x0 + (mu_ac - mu)
    xs = jnp.arange(W, dtype=jnp.float32)
    ys = jnp.arange(H, dtype=jnp.float32)
    dx = xs[None, :] - center[..., 0][..., None, None]
    dy = ys[:, None] - center[..., 1][..., None, None]
    g = jnp.exp(-(dx * dx + dy * dy) / (2.0 * sigma * sigma))
    window = ((xs[None, :] >= ul[..., 0][..., None, None])
              & (xs[None, :] < br[..., 0][..., None, None])
              & (ys[:, None] >= ul[..., 1][..., None, None])
              & (ys[:, None] < br[..., 1][..., None, None]))
    draw = (weight > 0.5)[..., None, None]
    return (g * window * draw).astype(jnp.float32), weight[..., None]
