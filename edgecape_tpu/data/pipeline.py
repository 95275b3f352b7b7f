"""Per-sample preprocessing: load -> (augment) -> affine crop -> normalize ->
heatmap targets.

Behavioral spec: the reference train/valid pipelines
(configs/train/1shot_split1.py:91-129): LoadImageFromFile (RGB),
TopDownGetRandomScaleRotation (rot ±2*15 deg w.p. 0.6, scale ±0.15 — the
only train augmentation), TopDownAffineFewShot (cv2.warpAffine to 224),
NormalizeTensor (ImageNet), TopDownGenerateTargetFewShot (MSRA sigma=1).

Host path uses cv2 for exact warp parity; the batched on-device path
(ops/warp.py + ops/heatmap.py) is used by the fast eval/bench runners.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from ..config import DataConfig
from ..ops import affine, heatmap
from ..ops.warp import IMAGENET_MEAN, IMAGENET_STD

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


@dataclasses.dataclass
class Sample:
    """One preprocessed instance (support or query)."""
    img: np.ndarray          # [H, W, 3] float32, normalized
    target: np.ndarray       # [K, h, w] heatmaps
    target_weight: np.ndarray  # [K]
    joints: np.ndarray       # [K, 2] model-input pixel coords
    joints_visible: np.ndarray  # [K]
    center: np.ndarray
    scale: np.ndarray
    rotation: float


def load_image(path: str) -> np.ndarray:
    """RGB uint8 image."""
    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(path)
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


def random_scale_rotation(scale, cfg: DataConfig, rng: np.random.Generator):
    """TopDownGetRandomScaleRotation semantics (mmpose): scale jitter from a
    clipped normal, rotation applied with probability rot_prob."""
    sf, rf = cfg.scale_factor, cfg.rot_factor
    s = scale * np.clip(rng.standard_normal() * sf + 1, 1 - sf, 1 + sf)
    if rng.random() <= cfg.rot_prob:
        r = float(np.clip(rng.standard_normal() * rf, -rf * 2, rf * 2))
    else:
        r = 0.0
    return s, r


def preprocess(record: dict, cfg: DataConfig, *, augment: bool = False,
               rng: Optional[np.random.Generator] = None,
               image: Optional[np.ndarray] = None,
               with_target: bool = True,
               normalize: bool = True) -> Sample:
    """record: db entry with image_file/center/scale/joints_3d/
    joints_3d_visible (see mp100.build_db). with_target=False skips host
    heatmap rendering (the device-render paths only need joints)."""
    img = image if image is not None else load_image(record["image_file"])
    center = np.asarray(record["center"], np.float32)
    scale = np.asarray(record["scale"], np.float32)
    rot = float(record.get("rotation", 0))
    joints = np.asarray(record["joints_3d"], np.float32)[:, :2].copy()
    visible = (np.asarray(record["joints_3d_visible"], np.float32)[:, 0]
               > 0).astype(np.float32)

    if augment and rng is not None:
        scale, rot = random_scale_rotation(scale, cfg, rng)

    size = (cfg.image_size, cfg.image_size)
    if cfg.use_udp:
        # unbiased data processing (reference use_udp branch,
        # top_down_transform.py:45-52): half-pixel-aligned warp, all
        # joints transformed, UDP heatmap encoding
        mat = affine.get_warp_matrix_udp(
            rot, center, (cfg.image_size - 1.0, cfg.image_size - 1.0),
            scale * 200.0)
        warped = cv2.warpAffine(img, mat, size, flags=cv2.INTER_LINEAR)
        joints_t = affine.affine_transform_points(joints, mat).astype(
            np.float32)
        if with_target:
            target, weight = heatmap.render_udp(
                joints_t, visible, (cfg.heatmap_size, cfg.heatmap_size),
                size, cfg.sigma)
        else:
            target = np.zeros((len(joints_t), 0, 0), np.float32)
            weight = visible[:, None].copy()
    else:
        mat = affine.get_affine_transform(center, scale, rot, size)
        warped = cv2.warpAffine(img, mat, size, flags=cv2.INTER_LINEAR)
        joints_t = joints.copy()
        vis_mask = visible > 0
        joints_t[vis_mask] = affine.affine_transform_points(
            joints[vis_mask], mat)
        if with_target:
            render = (heatmap.render_msra_unbiased
                      if getattr(cfg, "unbiased_encoding", False)
                      else heatmap.render_msra)
            target, weight = render(
                joints_t, visible, (cfg.heatmap_size, cfg.heatmap_size),
                size, cfg.sigma)
        else:
            target = np.zeros((len(joints_t), 0, 0), np.float32)
            weight = visible[:, None].copy()

    if normalize:
        img_out = (warped.astype(np.float32) / 255.0
                   - IMAGENET_MEAN) / IMAGENET_STD
    else:
        img_out = warped  # uint8; normalization happens on device
    return Sample(img=img_out, target=target, target_weight=weight[:, 0],
                  joints=joints_t, joints_visible=visible, center=center,
                  scale=scale, rotation=rot)
