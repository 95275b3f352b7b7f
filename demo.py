#!/usr/bin/env python
"""Demo CLI: one-shot keypoint transfer between two images.

Reference surface: demo.py (interactive cv2 clicking) and the gradio app
(app.py / gradio_utils/utils.py). This version takes the support annotation
from a JSON file (the headless equivalent of clicking):

  {"keypoints": [[x, y], ...], "skeleton": [[i, j], ...]}   # 0-indexed,
  pixel coords on the original support image.

Both images go through the reference demo preprocessing: square-pad to the
long side, resize to --size (default 256), ImageNet normalize; support
heatmaps are rasterized with sigma=2 (reference demo.py:192-201). Outputs a
3-panel visualization with the learned adjacency rendered as edge widths.
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def square_pad_resize(img: np.ndarray, size: int):
    """Pad to square (bottom/right, top-left anchored), then resize;
    points map as p' = p * scale."""
    import cv2
    h, w = img.shape[:2]
    side = max(h, w)
    padded = np.zeros((side, side, 3), img.dtype)
    padded[:h, :w] = img
    out = cv2.resize(padded, (size, size), interpolation=cv2.INTER_LINEAR)
    return out, size / side


def run_inference(support_img: np.ndarray, query_img: np.ndarray,
                  annotation: dict, *, checkpoint=None, backbone_ckpt=None,
                  size: int = 256, out_dir: str = "demo_out",
                  plot_similarity: bool = False,
                  plot_attention: bool = False):
    """Core inference used by both the CLI and the gradio app. Images are
    RGB uint8 arrays; annotation holds original-pixel keypoints +
    skeleton. Returns the visualization file path."""
    from edgecape_tpu.api import PoseEstimator
    from edgecape_tpu.config import Config, ModelConfig
    from edgecape_tpu.data.mp100 import EpisodeBatch
    from edgecape_tpu.ops import heatmap
    from edgecape_tpu.ops.warp import IMAGENET_MEAN, IMAGENET_STD
    from edgecape_tpu.train import checkpoint as ck
    from edgecape_tpu.utils.visualization import plot_results
    from edgecape_tpu.models.convert import load_backbone

    kpts = np.asarray(annotation["keypoints"], np.float32)
    skeleton = [[int(i), int(j)] for i, j in annotation.get("skeleton", [])]
    k_real = len(kpts)

    mcfg = ModelConfig(image_size=size, learn_skeleton=True,
                       attn_bias=True, use_bias_attn_module=True)
    cfg = Config(model=mcfg)
    K = mcfg.max_kpt

    sup, s_scale = square_pad_resize(support_img, size)
    qry, _ = square_pad_resize(query_img, size)

    visible = np.zeros(K, np.float32)
    visible[:k_real] = 1.0
    joints = np.zeros((K, 2), np.float32)
    joints[:k_real] = kpts * s_scale
    target, weight = heatmap.render_msra(
        joints, visible, (mcfg.heatmap_size, mcfg.heatmap_size),
        (size, size), sigma=2)

    adj = np.zeros((K, K), np.float32)
    for i, j in skeleton:
        if i < K and j < K:
            adj[i, j] = adj[j, i] = 1.0

    def norm(im):
        return (im.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD

    head_params = None
    if checkpoint:
        tree = ck.load_checkpoint(checkpoint)
        head_params = tree.get("params", tree)
    est = PoseEstimator(cfg, backbone_params=load_backbone(backbone_ckpt,
                                                           size),
                        head_params=head_params)
    batch = EpisodeBatch(
        img_s=norm(sup)[None, None], target_s=target[None, None],
        weight_s=weight[:, 0][None, None], img_q=norm(qry)[None],
        target_q=np.zeros_like(target)[None], weight_q=visible[None],
        joints_q=np.zeros((1, K, 2), np.float32), binary_adj=adj[None],
        rand_mask=np.ones((1, K), np.float32),
        meta={"query_center": np.array([[size / 2, size / 2]]),
              "query_scale": np.array([[size / 200, size / 200]]),
              "query_image_file": ["query"], "bbox_id": [0]})
    pred_norm, raw_adj, _ = est.forward_batch(batch)
    pred_px = np.asarray(pred_norm)[0] * size

    if plot_similarity or plot_attention:
        kis = list(range(min(k_real, 6)))
        _, _, similarity, attn = est.forward_debug(batch)
        if plot_similarity:
            from edgecape_tpu.utils.visualization import plot_similarity_maps
            plot_similarity_maps(norm(qry), np.asarray(similarity)[0],
                                 kis, out_dir)
        if plot_attention:
            from edgecape_tpu.utils.visualization import plot_attn
            plot_attn(norm(qry), np.asarray(attn)[:, 0], kis, out_dir,
                      gt_adj=adj[:k_real, :k_real],
                      learned_adj=np.asarray(raw_adj)[0][:k_real, :k_real])
    return plot_results(norm(sup), norm(qry), joints[:k_real],
                        visible[:k_real], pred_px[:k_real], skeleton,
                        np.asarray(raw_adj)[0][:k_real, :k_real], out_dir)


def main():
    p = argparse.ArgumentParser(description="EdgeCape-TPU demo")
    p.add_argument("--support", required=True)
    p.add_argument("--query", required=True)
    p.add_argument("--annotation", required=True,
                   help="JSON with support keypoints + skeleton")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--backbone-ckpt", default=None)
    p.add_argument("--out", default="demo_out")
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--plot-similarity", action="store_true",
                   help="also render per-keypoint similarity maps")
    p.add_argument("--plot-attn", action="store_true",
                   help="also render per-layer decoder attention maps")
    args = p.parse_args()

    from edgecape_tpu.utils.runtime import honor_env_platforms
    honor_env_platforms()

    from edgecape_tpu.data.pipeline import load_image

    with open(args.annotation) as f:
        ann = json.load(f)
    path = run_inference(load_image(args.support), load_image(args.query),
                         ann, checkpoint=args.checkpoint,
                         backbone_ckpt=args.backbone_ckpt, size=args.size,
                         out_dir=args.out,
                         plot_similarity=args.plot_similarity,
                         plot_attention=args.plot_attn)
    print("wrote", path)


if __name__ == "__main__":
    main()
