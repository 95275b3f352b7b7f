"""Support-keypoint feature pooling and loss functions.

Behavioral spec: reference EdgeCape/models/keypoint_heads/head.py
(TwoStageHead.forward support pooling at 175-188, get_loss at 224-294,
get_accuracy at 296-322). Pure functions over batched arrays; the module
wiring lives in models/edgecape.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _bilinear_matrix(src: int, dst: int) -> jnp.ndarray:
    """[dst, src] matrix of jax.image.resize(..., 'linear') along one axis
    (columns = resized basis vectors; resize is linear, so this is exact)."""
    return jax.image.resize(jnp.eye(src, dtype=jnp.float32), (dst, src),
                            method="linear")


def _torch_bilinear_matrix(src: int, dst: int) -> jnp.ndarray:
    """[dst, src] matrix of F.interpolate(..., 'bilinear',
    align_corners=False) along one axis. Unlike jax.image.resize, torch
    does NOT anti-alias when downsampling — each output sample is a 2-tap
    interpolation at (i+0.5)*src/dst - 0.5 (clamped at 0), which this
    reproduces exactly (needed for heatmap-loss parity with reference
    head.py:285-287)."""
    import numpy as np
    scale = src / dst
    x = np.maximum((np.arange(dst) + 0.5) * scale - 0.5, 0.0)
    lo = np.minimum(np.floor(x).astype(np.int64), src - 1)
    hi = np.minimum(lo + 1, src - 1)
    w = (x - lo).astype(np.float32)
    m = np.zeros((dst, src), np.float32)
    m[np.arange(dst), lo] += 1.0 - w
    m[np.arange(dst), hi] += w
    return jnp.asarray(m)


def pool_support_keypoints(support_feats: jnp.ndarray,
                           support_heatmaps: jnp.ndarray) -> jnp.ndarray:
    """Heatmap-weighted pooling of support features per keypoint.

    Args:
      support_feats: [B, S, gh, gw, C] backbone features.
      support_heatmaps: [B, S, K, H, W] GT gaussian heatmaps.
    Returns:
      [B, K, C] pooled tokens, averaged over shots.

    Semantics (reference head.py:175-187): bilinearly upsample the feature
    map to the heatmap grid, sum-normalize each heatmap, pool. Computed via
    the adjoint instead — sum_j h_j (U f)_j == sum_i (U^T h)_i f_i with U
    the separable bilinear upsampler — so the normalized heatmap is
    downsampled through U^T (two small matmuls) and the 16x larger
    upsampled feature map is never materialized. Exactly equal.
    """
    b, s, gh, gw, c = support_feats.shape
    _, _, k, hh, hw = support_heatmaps.shape
    hm = support_heatmaps.reshape(b, s, k, hh * hw)
    hm = (hm / (hm.sum(axis=-1, keepdims=True) + 1e-8)).reshape(
        b, s, k, hh, hw)
    uy = _bilinear_matrix(gh, hh)       # [hh, gh]
    ux = _bilinear_matrix(gw, hw)       # [hw, gw]
    hm_small = jnp.einsum("Yy,bskYX,Xx->bskyx", uy, hm, ux,
                          preferred_element_type=jnp.float32)
    pooled = jnp.einsum("bskyx,bsyxc->bskc", hm_small,
                        support_feats.astype(jnp.float32),
                        preferred_element_type=jnp.float32)
    return pooled.mean(axis=1).astype(support_feats.dtype)


def masked_l1(pred: jnp.ndarray, target: jnp.ndarray,
              weight: jnp.ndarray) -> jnp.ndarray:
    """Reference-style visibility-normalized L1 (head.py:256-269):
    per-sample sum over coords and joints / #visible, then mean over batch.

    pred/target: [B, K, 2]; weight: [B, K]."""
    per_kp = jnp.abs(pred - target).sum(axis=-1) * weight       # [B, K]
    normalizer = jnp.maximum(weight.sum(axis=-1), 1.0)          # [B]
    return (per_kp.sum(axis=-1) / normalizer).mean()


def reconstruction_loss(recon: jnp.ndarray, target: jnp.ndarray,
                        weight: jnp.ndarray, loss_weight: float
                        ) -> jnp.ndarray:
    """Masked-keypoint reconstruction loss (head.py:229-240)."""
    return masked_l1(recon, target, weight) * loss_weight


def heatmap_mse_loss(similarity: jnp.ndarray, target_heatmap: jnp.ndarray,
                     weight: jnp.ndarray, loss_weight: float) -> jnp.ndarray:
    """Optional auxiliary heatmap loss (head.py:273-294): MSE between
    sigmoid(similarity) and the max-normalized GT heatmap resized to the
    similarity grid.

    similarity: [B, K, h, w]; target_heatmap: [B, K, H, W]; weight [B, K].
    """
    b, k, h, w = similarity.shape
    sim = jax.nn.sigmoid(similarity)
    hh, hw = target_heatmap.shape[-2:]
    my = _torch_bilinear_matrix(hh, h)
    mx = _torch_bilinear_matrix(hw, w)
    tgt = jnp.einsum("yY,bkYX,xX->bkyx", my, target_heatmap, mx,
                     preferred_element_type=jnp.float32)
    peak = tgt.max(axis=(-2, -1), keepdims=True)
    tgt = tgt / (peak + 1e-10)
    l2 = ((sim - tgt) ** 2) * weight[:, :, None, None]
    l2 = l2.sum(axis=(-2, -1)) / (h * w)                        # [B, K]
    normalizer = jnp.maximum(weight.sum(axis=-1), 1.0)
    return (l2.sum(axis=-1) / normalizer).mean() * loss_weight


def pck_accuracy(pred: jnp.ndarray, target: jnp.ndarray, weight: jnp.ndarray,
                 norm_sizes: jnp.ndarray, thr: float = 0.2) -> jnp.ndarray:
    """Train-time PCK probe (head.py:296-322 / mmpose
    keypoint_pck_accuracy): fraction of visible joints whose normalized
    distance is below thr, averaged over joints then samples with >=1
    visible joint.

    pred/target: [B, K, 2] absolute pixels; weight: [B, K];
    norm_sizes: [B, 2].
    """
    dist = jnp.linalg.norm((pred - target) / norm_sizes[:, None, :],
                           axis=-1)                              # [B, K]
    hit = (dist < thr) & (weight > 0)
    per_sample_n = weight.sum(axis=-1)
    acc = hit.sum(axis=-1) / jnp.maximum(per_sample_n, 1.0)
    has = per_sample_n > 0
    return jnp.where(has.any(), (acc * has).sum() / jnp.maximum(
        has.sum(), 1), 0.0)


def keypoint_losses(outputs, targets_norm, weight, *,
                    proposals_for_loss=None,
                    recon=None, skeleton_loss_weight: float = 1.0,
                    similarity=None, target_heatmap=None,
                    with_heatmap_loss: bool = False,
                    heatmap_loss_weight: float = 2.0) -> dict:
    """Full loss dict (reference get_loss, head.py:224-271).

    outputs: [L, B, K, 2] per-decoder-layer normalized predictions.
    targets_norm: [B, K, 2] GT keypoints normalized by image size.
    weight: [B, K] visibility (query AND all supports).
    """
    losses = {}
    if recon is not None:
        losses["adj_reconstruct_loss"] = reconstruction_loss(
            recon, targets_norm, weight, skeleton_loss_weight)
    if with_heatmap_loss and similarity is not None:
        losses["heatmap_loss"] = heatmap_mse_loss(
            similarity, target_heatmap, weight, heatmap_loss_weight)
    if proposals_for_loss is not None:
        losses["proposal_loss"] = masked_l1(proposals_for_loss, targets_norm,
                                            weight)
    for idx in range(outputs.shape[0]):
        losses[f"l1_loss_layer{idx}"] = masked_l1(outputs[idx], targets_norm,
                                                  weight)
    return losses
