"""MP-100 episodic dataset: class-balanced train pairing and seeded val/test
episode generation, bit-compatible with the reference protocol.

Behavioral spec: reference
EdgeCape/datasets/datasets/mp100/transformer_dataset.py (db construction
128-252, random_paired_samples 70-83, make_paired_samples 85-98) and
test_dataset.py (same seeded sampling). Episode index sets are identical to
the reference because CPython's `random.sample` with the same seeds is used
over the same per-class object lists.

TPU redesign: instead of per-sample ragged dicts through a torch DataLoader,
episodes are collated host-side into fixed-shape numpy batches
([B, S, ...] supports, K padded to max_kpt, [K, K] adjacency rasterized from
the edge list) ready for a single device_put.
"""

from __future__ import annotations

import os
import random
from dataclasses import dataclass, field
from typing import Optional

import numpy as np

from ..config import DataConfig
from ..ops import affine, graph
from .coco import CocoIndex
from .pipeline import preprocess


def build_db(coco: CocoIndex, img_prefix: str, image_size,
             max_kpt: Optional[int], *, check_files: bool = True):
    """Ground-truth records per annotation instance.

    Mirrors reference _get_db/_load_coco_keypoint_annotation_kernel
    (transformer_dataset.py:128-222): bbox sanitization, joints padded to
    max_kpt, center/scale from the padded bbox, category skeleton attached.

    check_files: True/"raise" raises on any missing image (episode-parity
    guard, the safe default); "skip" drops the record exactly like the
    reference TRAIN dataset (transformer_dataset.py:202 stats
    os.path.exists and skips, shifting subsequent obj_ids); False never
    stats, exactly like the reference TEST dataset (test_dataset.py:201-203
    unconditionally appends).

    Returns (db, cat2obj).
    """
    db = []
    cat2obj = {cid: [] for cid in coco.get_cat_ids()}
    obj_id = 0
    for img_id in coco.get_img_ids():
        info = coco.load_img(img_id)
        width, height = info["width"], info["height"]
        for ann in coco.img_anns(img_id, iscrowd=False):
            if "bbox" not in ann or "keypoints" not in ann:
                continue
            x, y, w, h = ann["bbox"]
            x1, y1 = max(0, x), max(0, y)
            x2 = min(width - 1, x1 + max(0, w - 1))
            y2 = min(height - 1, y1 + max(0, h - 1))
            if not (("area" not in ann or ann["area"] > 0)
                    and x2 > x1 and y2 > y1):
                continue
            if max(ann["keypoints"]) == 0:
                continue
            if ann.get("num_keypoints") == 0:
                continue
            kpts = np.array(ann["keypoints"], np.float32).reshape(-1, 3)
            cat_kpt_num = kpts.shape[0]
            k = max_kpt if max_kpt is not None else cat_kpt_num
            joints = np.zeros((k, 3), np.float32)
            visible = np.zeros((k, 3), np.float32)
            joints[:cat_kpt_num, :2] = kpts[:, :2]
            visible[:cat_kpt_num, :2] = np.minimum(1, kpts[:, 2:3])
            clean_bbox = [x1, y1, x2 - x1, y2 - y1]
            center, scale = affine.xywh2cs(*clean_bbox,
                                           image_size=image_size)
            image_file = os.path.join(img_prefix, info["file_name"])
            if check_files and not os.path.exists(image_file):
                if check_files == "skip":
                    # exact reference-train behavior: drop the record
                    # (transformer_dataset.py:202). NOTE this shifts every
                    # subsequent obj_id, so seeded episode draws are only
                    # comparable to a reference run over the SAME partial
                    # image set.
                    continue
                # default: fail loudly. A partially downloaded MP-100
                # would otherwise produce plausible but non-comparable
                # PCK numbers with no warning.
                raise FileNotFoundError(
                    f"annotation references missing image {image_file!r}; "
                    "episode parity requires the full image set (or "
                    "check_files='skip' for reference-train skip "
                    "semantics, check_files=False to defer to load time)")
            cat2obj[ann["category_id"]].append(obj_id)
            db.append({
                "image_file": image_file,
                "center": center,
                "scale": scale,
                "rotation": 0,
                "bbox": clean_bbox,
                "bbox_score": 1,
                "joints_3d": joints,
                "joints_3d_visible": visible,
                "category_id": ann["category_id"],
                "cat_kpt_num": cat_kpt_num,
                "bbox_id": obj_id,
                "skeleton": coco.cats[ann["category_id"]]["skeleton"],
                # PCKh normalization box when the annotation provides it
                # (reference test_base_dataset.py:114-117 reads
                # item['head_size']; MP-100 jsons typically omit it)
                "head_size": float(ann.get("head_size", 0.0)),
            })
            obj_id += 1
    return db, cat2obj


@dataclass
class EpisodeBatch:
    """Fixed-shape device-ready arrays + host-side decode metadata."""
    img_s: np.ndarray        # [B, S, H, W, 3]
    target_s: np.ndarray     # [B, S, K, h, w]
    weight_s: np.ndarray     # [B, S, K]
    img_q: np.ndarray        # [B, H, W, 3]
    target_q: np.ndarray     # [B, K, h, w]
    weight_q: np.ndarray     # [B, K]
    joints_q: np.ndarray     # [B, K, 2] model-input pixel coords
    binary_adj: np.ndarray   # [B, K, K]
    rand_mask: np.ndarray    # [B, K] 1 keep / 0 masked (train stage 2)
    joints_s: np.ndarray = None   # [B, S, K, 2] support joints (device
    vis_s: np.ndarray = None      # [B, S, K]    rendering path)
    meta: dict = field(default_factory=dict)


class MP100Dataset:
    """mode: 'train' | 'val' | 'test'."""

    def __init__(self, cfg: DataConfig, mode: str = "train",
                 check_files: bool = True):
        self.cfg = cfg
        self.mode = mode
        self.coco = CocoIndex(cfg.ann_file)
        img_size = (cfg.image_size, cfg.image_size)
        self.db, self.cat2obj = build_db(self.coco, cfg.img_prefix, img_size,
                                         cfg.max_kpt,
                                         check_files=check_files)
        if cfg.valid_class_ids is not None:
            self.valid_class_ids = list(cfg.valid_class_ids)
        else:
            self.valid_class_ids = self.coco.get_cat_ids()
        self.num_shots = cfg.num_shots
        self.img_prefix = cfg.img_prefix if cfg.img_prefix.endswith("/") \
            else cfg.img_prefix + "/"
        self.id2name = {i: im["file_name"] for i, im in self.coco.imgs.items()}
        self.name2id = {v: k for k, v in self.id2name.items()}
        if mode == "train":
            self.resample_episodes()
        else:
            self.make_episodes()

    # ----------------------------------------------------------- episodes
    def resample_episodes(self):
        """Class-balanced random (shots+1)-tuples, reshuffled every epoch
        (reference random_paired_samples)."""
        counts = [len(self.cat2obj[c]) for c in self.valid_class_ids]
        max_count = max(counts)
        samples = []
        for cls in self.valid_class_ids:
            pool = self.cat2obj[cls]
            for _ in range(max_count):
                samples.append(random.sample(pool, self.num_shots + 1))
        arr = np.array(samples)
        np.random.shuffle(arr)
        self.paired_samples = arr

    def make_episodes(self):
        """Seeded deterministic episodes (reference make_paired_samples:
        random.seed(1), np.random.seed(0)). With cfg.pin_query_images set,
        only episodes whose query is one of the pinned file names are kept
        (the reference's CustomTestPoseDataset qualitative-figure mode)."""
        random.seed(1)
        np.random.seed(0)
        pinned = None
        if self.cfg.pin_query_images:
            pinned = {os.path.basename(n)
                      for n in self.cfg.pin_query_images}
        samples = []
        for cls in self.valid_class_ids:
            for _ in range(self.cfg.num_episodes):
                drawn = random.sample(self.cat2obj[cls],
                                      self.num_shots + self.cfg.num_queries)
                supports = drawn[:self.num_shots]
                for q in drawn[self.num_shots:]:
                    if pinned is not None:
                        name = os.path.basename(
                            self.db[q]["image_file"])
                        if name not in pinned:
                            continue
                    samples.append(supports + [q])
        self.paired_samples = np.array(samples)

    def __len__(self):
        return len(self.paired_samples)

    # ----------------------------------------------------------- loading
    def _rand_mask(self, joint_weight: np.ndarray, masking_ratio: float,
                   rng: Optional[np.random.Generator] = None) -> np.ndarray:
        """Zero a random masking_ratio of jointly-visible keypoints
        (reference transformer_base_dataset.rand_mask). Draws from `rng`
        when given (per-sample determinism for sharded loading), else
        from global np.random like the reference."""
        mask = joint_weight.copy()
        n = int(mask.sum() * masking_ratio)
        idx = np.where(mask == 1)[0]
        perm = (rng.permutation(idx) if rng is not None
                else np.random.permutation(idx))
        mask[perm[:n]] = 0
        return mask

    def get_episode(self, idx: int, *, augment: Optional[bool] = None,
                    rng: Optional[np.random.Generator] = None,
                    masking_ratio: float = 0.0):
        pair = self.paired_samples[idx]
        augment = (self.mode == "train") if augment is None else augment
        supports = [preprocess(self.db[i], self.cfg, augment=augment,
                               rng=rng) for i in pair[:-1]]
        query = preprocess(self.db[pair[-1]], self.cfg, augment=augment,
                           rng=rng)
        skeleton = self.db[pair[0]]["skeleton"]
        return supports, query, skeleton, pair

    # -------------------------------------------------- support grouping
    def support_groups(self):
        """Consecutive episode rows sharing the same support set (val/test
        episodes are generated as num_queries consecutive rows per
        episode). Returns list of (support_ids tuple, [row indices])."""
        groups = []
        cur_key, cur_rows = None, []
        for i, pair in enumerate(self.paired_samples):
            key = tuple(pair[:-1])
            if key != cur_key:
                if cur_rows:
                    groups.append((cur_key, cur_rows))
                cur_key, cur_rows = key, []
            cur_rows.append(i)
        if cur_rows:
            groups.append((cur_key, cur_rows))
        return groups

    def collate_group(self, groups, *, num_threads: int = 8):
        """Collate G support groups + all their queries.

        Returns (support arrays dict [G, ...], query EpisodeBatch-like dict
        with [sum(len(rows)), ...] and per-row group index).
        Support images are preprocessed once per group instead of once per
        query (the reference re-runs them for each of the 15 queries);
        heatmaps are NOT rendered host-side (the device renders them from
        joints); per-image work runs on a thread pool.
        """
        from concurrent.futures import ThreadPoolExecutor

        cfg = self.cfg
        s, k = self.num_shots, cfg.max_kpt
        g = len(groups)
        size = cfg.image_size

        sup_img = np.zeros((g, s, size, size, 3), np.uint8)
        sup_joints = np.zeros((g, s, k, 2), np.float32)
        sup_vis = np.zeros((g, s, k), np.float32)
        adj = np.zeros((g, k, k), np.float32)

        q_rows = [r for _, rows in groups for r in rows]
        nq = len(q_rows)
        q_img = np.zeros((nq, size, size, 3), np.uint8)
        q_w = np.zeros((nq, k), np.float32)
        joints_q = np.zeros((nq, k, 2), np.float32)
        group_of_row = np.zeros(nq, np.int32)
        centers = np.zeros((nq, 2), np.float32)
        scales = np.zeros((nq, 2), np.float32)
        paths, bbox_ids, cats = [], [], []

        def prep(db_id):
            # uint8 out: ImageNet normalization happens on device (4x less
            # host->device traffic; same math, reference operation order)
            return preprocess(self.db[db_id], cfg, augment=False,
                              with_target=False, normalize=False)

        sup_jobs = [(gi, si, sid) for gi, (sup_ids, _) in enumerate(groups)
                    for si, sid in enumerate(sup_ids)]
        q_jobs = []
        row_i = 0
        for gi, (sup_ids, rows) in enumerate(groups):
            adj[gi] = graph.adjacency_from_edges(
                self.db[sup_ids[0]]["skeleton"], k)
            for r in rows:
                q_jobs.append((row_i, gi, r))
                row_i += 1

        with ThreadPoolExecutor(max_workers=num_threads) as pool:
            sup_samples = list(pool.map(lambda j: prep(j[2]), sup_jobs))
            q_samples = list(pool.map(
                lambda j: prep(self.paired_samples[j[2]][-1]), q_jobs))

        for (gi, si, _), sample in zip(sup_jobs, sup_samples):
            sup_img[gi, si] = sample.img
            sup_joints[gi, si] = sample.joints
            sup_vis[gi, si] = sample.joints_visible

        for (row_i, gi, r), sample in zip(q_jobs, q_samples):
            qid = self.paired_samples[r][-1]
            q_img[row_i] = sample.img
            q_w[row_i] = sample.joints_visible
            joints_q[row_i] = sample.joints
            group_of_row[row_i] = gi
            centers[row_i] = sample.center
            scales[row_i] = sample.scale
            paths.append(self.db[qid]["image_file"])
            bbox_ids.append(int(r))
            cats.append(self.db[qid]["category_id"])

        support = {"img_s": sup_img, "binary_adj": adj,
                   "joints_s": sup_joints, "vis_s": sup_vis}
        query = {"img_q": q_img, "weight_q": q_w, "joints_q": joints_q,
                 "group": group_of_row}
        meta = {"query_center": centers, "query_scale": scales,
                "query_image_file": paths, "bbox_id": bbox_ids,
                "category_id": cats}
        return support, query, meta

    # ------------------------------------------------- native fast path
    def collate_native(self, indices, *, augment: Optional[bool] = None,
                       rng: Optional[np.random.Generator] = None,
                       masking_ratio: float = 0.0,
                       num_threads: int = 0) -> EpisodeBatch:
        """Batched collate through the C++ preprocessing core
        (native/preprocess.cc): one multithreaded call for all warps and
        one for all heatmaps, instead of per-image python. Identical
        outputs to `collate` up to cv2's fixed-point bilinear rounding."""
        from ..ops.warp import (IMAGENET_MEAN, IMAGENET_STD, invert_affine)
        from . import native as native_lib
        from .pipeline import load_image, random_scale_rotation

        cfg = self.cfg
        if getattr(cfg, "unbiased_encoding", False) and not cfg.use_udp:
            raise NotImplementedError(
                "the C++ core renders biased-MSRA targets; use collate() "
                "for unbiased_encoding")
        augment = (self.mode == "train") if augment is None else augment
        b, s, k = len(indices), self.num_shots, cfg.max_kpt
        size = cfg.image_size
        n_img = b * (s + 1)

        images, inv_mats, all_joints, all_vis = [], [], [], []
        metas = []
        per_sample = isinstance(rng, (list, tuple))
        for bi, idx in enumerate(indices):
            ep_rng = rng[bi] if per_sample else rng
            pair = self.paired_samples[idx]
            recs = [self.db[i] for i in pair]
            q_cs = None
            for rec in recs:
                img = load_image(rec["image_file"])
                center = np.asarray(rec["center"], np.float32)
                scale = np.asarray(rec["scale"], np.float32)
                rot = float(rec.get("rotation", 0))
                if augment and ep_rng is not None:
                    scale, rot = random_scale_rotation(scale, cfg, ep_rng)
                joints = np.asarray(rec["joints_3d"], np.float32)[:, :2]
                vis = (np.asarray(rec["joints_3d_visible"],
                                  np.float32)[:, 0] > 0).astype(np.float32)
                if cfg.use_udp:
                    # UDP path (pipeline.preprocess use_udp branch):
                    # half-pixel-aligned warp, ALL joints transformed
                    mat = affine.get_warp_matrix_udp(
                        rot, center, (size - 1.0, size - 1.0),
                        scale * 200.0)
                    jt = affine.affine_transform_points(joints, mat).astype(
                        np.float32)
                else:
                    mat = affine.get_affine_transform(center, scale, rot,
                                                      (size, size))
                    jt = joints.copy()
                    m = vis > 0
                    jt[m] = affine.affine_transform_points(joints[m], mat)
                images.append(img)
                inv_mats.append(invert_affine(mat))
                all_joints.append(jt)
                all_vis.append(vis)
                q_cs = (center, scale)  # last one is the query's
            metas.append((idx, pair, recs[-1], q_cs))

        warped = native_lib.warp_normalize_batch(
            images, np.stack(inv_mats).astype(np.float32), (size, size),
            IMAGENET_MEAN, IMAGENET_STD, num_threads)
        render = (native_lib.udp_heatmaps_batch if cfg.use_udp
                  else native_lib.msra_heatmaps_batch)
        targets, weights = render(
            np.stack(all_joints), np.stack(all_vis),
            (cfg.heatmap_size, cfg.heatmap_size), (float(size), float(size)),
            cfg.sigma, num_threads)

        warped = warped.reshape(b, s + 1, size, size, 3)
        targets = targets.reshape(b, s + 1, k, cfg.heatmap_size,
                                  cfg.heatmap_size)
        weights = weights.reshape(b, s + 1, k)
        joints_arr = np.stack(all_joints).reshape(b, s + 1, k, 2)
        vis_arr = np.stack(all_vis).reshape(b, s + 1, k)

        adj = np.zeros((b, k, k), np.float32)
        rand_mask = np.ones((b, k), np.float32)
        centers = np.zeros((b, 2), np.float32)
        scales = np.zeros((b, 2), np.float32)
        paths, bbox_ids, cats, pairs = [], [], [], []
        for bi, (idx, pair, qrec, q_cs) in enumerate(metas):
            adj[bi] = graph.adjacency_from_edges(
                self.db[pair[0]]["skeleton"], k)
            if masking_ratio > 0:
                joint_w = weights[bi, :s].prod(axis=0)
                rand_mask[bi] = self._rand_mask(
                    joint_w, masking_ratio,
                    rng=rng[bi] if per_sample else None)
            centers[bi], scales[bi] = q_cs
            paths.append(qrec["image_file"])
            bbox_ids.append(int(idx))
            cats.append(qrec["category_id"])
            pairs.append(pair)

        meta = {"query_center": centers, "query_scale": scales,
                "query_image_file": paths, "bbox_id": bbox_ids,
                "category_id": cats, "pair": pairs}
        return EpisodeBatch(
            img_s=warped[:, :s], target_s=targets[:, :s],
            weight_s=weights[:, :s], img_q=warped[:, s],
            target_q=targets[:, s], weight_q=weights[:, s],
            joints_q=joints_arr[:, s], binary_adj=adj,
            rand_mask=rand_mask, joints_s=joints_arr[:, :s],
            vis_s=vis_arr[:, :s], meta=meta)

    # ----------------------------------------------------------- batching
    def collate(self, indices, *, augment: Optional[bool] = None,
                rng: Optional[np.random.Generator] = None,
                masking_ratio: float = 0.0) -> EpisodeBatch:
        cfg = self.cfg
        b, s, k = len(indices), self.num_shots, cfg.max_kpt
        hs = cfg.heatmap_size
        img_s = np.zeros((b, s, cfg.image_size, cfg.image_size, 3),
                         np.float32)
        target_s = np.zeros((b, s, k, hs, hs), np.float32)
        weight_s = np.zeros((b, s, k), np.float32)
        img_q = np.zeros((b, cfg.image_size, cfg.image_size, 3), np.float32)
        target_q = np.zeros((b, k, hs, hs), np.float32)
        weight_q = np.zeros((b, k), np.float32)
        joints_q = np.zeros((b, k, 2), np.float32)
        joints_s = np.zeros((b, s, k, 2), np.float32)
        vis_s = np.zeros((b, s, k), np.float32)
        adj = np.zeros((b, k, k), np.float32)
        rand_mask = np.ones((b, k), np.float32)
        centers = np.zeros((b, 2), np.float32)
        scales = np.zeros((b, 2), np.float32)
        paths, bbox_ids, cats = [], [], []

        per_sample = isinstance(rng, (list, tuple))
        for bi, idx in enumerate(indices):
            # rng may be one Generator for the whole batch (legacy) or a
            # per-sample list — the latter makes any row slice of the
            # batch bit-identical to the full collate (sharded loading)
            ep_rng = rng[bi] if per_sample else rng
            supports, query, skeleton, pair = self.get_episode(
                idx, augment=augment, rng=ep_rng)
            for si, sup in enumerate(supports):
                img_s[bi, si] = sup.img
                target_s[bi, si] = sup.target
                weight_s[bi, si] = sup.target_weight
                joints_s[bi, si] = sup.joints
                vis_s[bi, si] = sup.joints_visible
            img_q[bi] = query.img
            target_q[bi] = query.target
            weight_q[bi] = query.target_weight
            joints_q[bi] = query.joints
            adj[bi] = graph.adjacency_from_edges(skeleton, k)
            if masking_ratio > 0:
                joint_w = weight_s[bi].prod(axis=0)
                rand_mask[bi] = self._rand_mask(
                    joint_w, masking_ratio,
                    rng=ep_rng if per_sample else None)
            qrec = self.db[pair[-1]]
            centers[bi] = query.center
            scales[bi] = query.scale
            paths.append(qrec["image_file"])
            bbox_ids.append(int(idx))
            cats.append(qrec["category_id"])

        meta = {"query_center": centers, "query_scale": scales,
                "query_image_file": paths, "bbox_id": bbox_ids,
                "category_id": cats,
                "pair": [self.paired_samples[i] for i in indices]}
        return EpisodeBatch(img_s=img_s, target_s=target_s,
                            weight_s=weight_s, img_q=img_q,
                            target_q=target_q, weight_q=weight_q,
                            joints_q=joints_q, binary_adj=adj,
                            rand_mask=rand_mask, joints_s=joints_s,
                            vis_s=vis_s, meta=meta)

    def batches(self, batch_size: int, *, shuffle: bool = False,
                rng: Optional[np.random.Generator] = None,
                masking_ratio: float = 0.0, drop_last: bool = False):
        order = np.arange(len(self))
        if shuffle and rng is not None:
            rng.shuffle(order)
        for start in range(0, len(order), batch_size):
            chunk = order[start:start + batch_size]
            if drop_last and len(chunk) < batch_size:
                return
            yield self.collate(list(chunk), rng=rng,
                               masking_ratio=masking_ratio)
