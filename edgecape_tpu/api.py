"""High-level estimator: backbone + head under one jitted, shardable
forward.

Replaces the reference detector glue (EdgeCape.forward_test / predict,
detectors/EdgeCape.py:131-191): one compiled function maps a batch of
episodes to normalized keypoint predictions + learned adjacency. Data
parallelism is a NamedSharding on the batch axis over a 1-D mesh
(parallel/mesh.py) — XLA inserts the collectives.
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import Config
from .data.mp100 import EpisodeBatch
from .models import dinov2
from .models.edgecape import EdgeCape, ModelOutput
from .ops import affine
from .ops.warp import IMAGENET_MEAN, IMAGENET_STD


def _cast_floats(tree, dtype):
    """Cast floating leaves of a pytree (params / activations); bools and
    ints (masks, group indices) pass through."""
    def cast(a):
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating):
            return a.astype(dtype)
        return a
    return jax.tree.map(cast, tree)


def _maybe_normalize(imgs):
    """uint8 images -> ImageNet-normalized float32 (no-op for floats,
    which arrive pre-normalized from the parity collate path)."""
    if imgs.dtype == jnp.uint8:
        return ((imgs.astype(jnp.float32) / 255.0
                 - jnp.asarray(IMAGENET_MEAN, jnp.float32))
                / jnp.asarray(IMAGENET_STD, jnp.float32))
    return imgs


class PoseEstimator:
    """Inference-oriented wrapper around (backbone params, head params)."""

    def __init__(self, cfg: Config,
                 backbone_params: Optional[Any] = None,
                 head_params: Optional[Any] = None,
                 rng: Optional[jax.Array] = None,
                 mesh: Optional[jax.sharding.Mesh] = None):
        import dataclasses as _dc

        from .config import resolve_use_flash
        # Resolve the tri-state: None = auto (flash on TPU — changes no
        # parameters, only compute; under a mesh the forward runs inside
        # shard_map so the Pallas kernels see per-shard shapes). An
        # EXPLICIT use_flash=False is honored: with compute_dtype float32
        # that is the strict-parity path (no Pallas, no bf16 casts) a
        # reference-checkpoint PCK bisection needs.
        cfg = _dc.replace(cfg, model=_dc.replace(
            cfg.model, use_flash=resolve_use_flash(cfg.model)))
        self.cfg = cfg
        self.model = EdgeCape(cfg.model)
        self.backbone_cfg = dinov2.VIT_S14
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        if backbone_params is None:
            backbone_params = jax.jit(functools.partial(
                dinov2.init_params, image_size=cfg.model.image_size))(rng)
        self.backbone_params = backbone_params
        if head_params is None:
            g = cfg.model.image_size // cfg.model.patch_size
            k = cfg.model.max_kpt
            s = cfg.test_data.num_shots or 1
            init = jax.jit(lambda r: self.model.init(
                {"params": r, "dropout": jax.random.PRNGKey(0)},
                jnp.zeros((1, g, g, cfg.model.backbone_dim)),
                jnp.zeros((1, s, g, g, cfg.model.backbone_dim)),
                jnp.zeros((1, s, k, cfg.model.heatmap_size,
                           cfg.model.heatmap_size)),
                jnp.zeros((1, k)), jnp.zeros((1, k, k))))
            head_params = init(jax.random.PRNGKey(1))["params"]
        self.head_params = head_params
        self.mesh = mesh
        self._fwd = None

    # ------------------------------------------------------------ forward
    def _build_forward(self):
        model = self.model
        bb_cfg = self.backbone_cfg
        dtype = jnp.dtype(self.cfg.model.compute_dtype)
        # use_flash was resolved to a concrete bool in __init__;
        # False means strict parity — never re-auto-enable here
        flash = bool(self.cfg.model.use_flash)

        def forward(bb_params, head_params, img_s, img_q, target_s,
                    weight_s, binary_adj):
            b, s = img_s.shape[:2]
            imgs = jnp.concatenate(
                [img_s.reshape((b * s,) + img_s.shape[2:]), img_q], axis=0)
            feats = dinov2.extract_features(bb_params, imgs, bb_cfg,
                                            dtype=dtype, use_flash=flash)
            gh, gw = feats.shape[1:3]
            feat_s = feats[:b * s].reshape(b, s, gh, gw, -1)
            feat_q = feats[b * s:]
            mask_s = jnp.prod(weight_s, axis=1)           # [B, K]
            out: ModelOutput = model.apply(
                {"params": head_params}, feat_q, feat_s, target_s, mask_s,
                binary_adj)
            return (out.outputs[-1], out.encode.raw_adj,
                    jnp.stack([out.encode.proposals] + list(out.points[1:]),
                              axis=0))

        if self.mesh is not None:
            # episodes are independent: run the whole forward per-shard
            # under shard_map (params replicated, batch axis sharded) so
            # the Pallas kernels see local shapes — no GSPMD partitioning
            # of custom calls needed
            P = jax.sharding.PartitionSpec
            sharded = jax.shard_map(
                forward, mesh=self.mesh,
                in_specs=(P(), P(), P("data"), P("data"), P("data"),
                          P("data"), P("data")),
                out_specs=(P("data"), P("data"), P(None, "data")),
                check_vma=False)
            return jax.jit(sharded)
        return jax.jit(forward)

    # ------------------------------------------- cached-support forward
    def _build_cached_fns(self):
        model = self.model
        bb_cfg = self.backbone_cfg
        dtype = jnp.dtype(self.cfg.model.compute_dtype)
        # use_flash was resolved to a concrete bool in __init__;
        # False means strict parity — never re-auto-enable here
        flash = bool(self.cfg.model.use_flash)
        hs = self.cfg.model.heatmap_size
        size = float(self.cfg.model.image_size)
        sigma = self.cfg.test_data.sigma

        use_udp = self.cfg.test_data.use_udp
        unbiased = getattr(self.cfg.test_data, "unbiased_encoding", False)

        def support_fn(bb_params, head_params, img_s, joints_s, vis_s,
                       binary_adj):
            from .ops.heatmap import (render_msra_jnp,
                                      render_msra_unbiased_jnp,
                                      render_udp_jnp)
            render = (render_udp_jnp if use_udp
                      else render_msra_unbiased_jnp if unbiased
                      else render_msra_jnp)
            g, s = img_s.shape[:2]
            imgs = _maybe_normalize(
                img_s.reshape((g * s,) + img_s.shape[2:]))
            feats = dinov2.extract_features(bb_params, imgs, bb_cfg,
                                            dtype=dtype, use_flash=flash)
            gh, gw = feats.shape[1:3]
            feat_s = feats.reshape(g, s, gh, gw, -1)
            # support heatmaps rendered on device from joints (saves the
            # [G, S, K, 64, 64] host->device transfer)
            target_s, weight_s = render(joints_s, vis_s, (hs, hs),
                                        (size, size), sigma)
            mask_s = jnp.prod(weight_s[..., 0], axis=1)
            ctx = model.apply({"params": head_params}, feat_s, target_s,
                              mask_s, binary_adj,
                              method=type(model).encode_support)
            return ctx

        head_dtype = jnp.dtype(self.cfg.model.head_dtype)

        def query_rows_fn(bb_params, head_params, ctx_rows, img_q):
            # ctx_rows: support context already gathered per query row
            feat_q = dinov2.extract_features(bb_params,
                                             _maybe_normalize(img_q),
                                             bb_cfg, dtype=dtype,
                                             use_flash=flash)
            raw_adj = ctx_rows.raw_adj
            if head_dtype != jnp.float32:
                # hot phase in bf16: params cast at the boundary, flax
                # promotion keeps scores/softargmax fp32 via
                # preferred_element_type; coords cast back below
                head_params = _cast_floats(head_params, head_dtype)
                ctx_rows = _cast_floats(ctx_rows, head_dtype)
                feat_q = feat_q.astype(head_dtype)
            enc = model.apply({"params": head_params}, feat_q, ctx_rows,
                              method=type(model).encode_query)
            outputs, _ = model.apply(
                {"params": head_params}, enc.kp_tokens, enc.img_tokens,
                enc.proposals, enc.adj, enc.hop_stack, enc.kp_valid,
                enc.img_pos, method=type(model).decode)
            return outputs[-1].astype(jnp.float32), raw_adj

        def query_fn(bb_params, head_params, ctx, group, img_q):
            # gather each query row's support context
            ctx_rows = jax.tree.map(lambda a: a[group], ctx)
            return query_rows_fn(bb_params, head_params, ctx_rows, img_q)

        def combined_fn(bb_params, head_params, img_s, joints_s, vis_s,
                        binary_adj, group, img_q):
            ctx = support_fn(bb_params, head_params, img_s, joints_s,
                             vis_s, binary_adj)
            return query_fn(bb_params, head_params, ctx, group, img_q)

        if self.mesh is not None:
            # multi-chip eval: support phase shard_mapped over groups,
            # query phase shard_mapped over rows; the ctx row-gather sits
            # between the two manual regions where XLA inserts the
            # cross-shard collective. Pallas kernels run per-shard.
            P = jax.sharding.PartitionSpec
            sup_sharded = jax.shard_map(
                support_fn, mesh=self.mesh,
                in_specs=(P(), P(), P("data"), P("data"), P("data"),
                          P("data")),
                out_specs=P("data"), check_vma=False)
            qry_sharded = jax.shard_map(
                query_rows_fn, mesh=self.mesh,
                in_specs=(P(), P(), P("data"), P("data")),
                out_specs=(P("data"), P("data")), check_vma=False)

            def combined_mesh(bb_params, head_params, img_s, joints_s,
                              vis_s, binary_adj, group, img_q):
                ctx = sup_sharded(bb_params, head_params, img_s, joints_s,
                                  vis_s, binary_adj)
                ctx_rows = jax.tree.map(lambda a: a[group], ctx)
                return qry_sharded(bb_params, head_params, ctx_rows, img_q)

            return (jax.jit(sup_sharded), jax.jit(query_fn),
                    jax.jit(combined_mesh))
        return jax.jit(support_fn), jax.jit(query_fn), jax.jit(combined_fn)

    def _mesh_multiple(self) -> int:
        return 1 if self.mesh is None else int(self.mesh.devices.size)

    def forward_cached(self, support: dict, query: dict):
        """Split-phase forward: support context computed once per episode
        group, queries gathered onto it — all in ONE device dispatch.
        Returns (pred_norm [Nq, K, 2], raw_adj [Nq, K, K])."""
        if not hasattr(self, "_cached_fns") or self._cached_fns is None:
            self._cached_fns = self._build_cached_fns()
        _, _, combined = self._cached_fns
        m = self._mesh_multiple()
        nq = int(query["group"].shape[0])
        if m > 1 and (query["group"].shape[0] % m
                      or support["img_s"].shape[0] % m):
            # shard_map needs group/row counts divisible by the mesh;
            # pad by repeating the last group / the last query row and
            # slice the padded rows back off below
            from .parallel.mesh import pad_to_multiple
            support = {k: pad_to_multiple(np.asarray(v), m)[0]
                       for k, v in support.items()}
            query = {k: pad_to_multiple(np.asarray(v), m)[0]
                     for k, v in query.items()}
        pred, adj = combined(self.backbone_params, self.head_params,
                             jnp.asarray(support["img_s"]),
                             jnp.asarray(support["joints_s"]),
                             jnp.asarray(support["vis_s"]),
                             jnp.asarray(support["binary_adj"]),
                             jnp.asarray(query["group"]),
                             jnp.asarray(query["img_q"]))
        return pred[:nq], adj[:nq]

    def forward_batch(self, batch: EpisodeBatch):
        """Returns (pred_norm [B, K, 2] in [0,1], raw_adj [B, K, K],
        trajectory [L+1, B, K, 2]) as device arrays."""
        if self._fwd is None:
            self._fwd = self._build_forward()
        m = self._mesh_multiple()
        arrs = [np.asarray(batch.img_s), np.asarray(batch.img_q),
                np.asarray(batch.target_s), np.asarray(batch.weight_s),
                np.asarray(batch.binary_adj)]
        b = arrs[0].shape[0]
        if m > 1 and b % m:
            from .parallel.mesh import pad_to_multiple
            arrs = [pad_to_multiple(a, m)[0] for a in arrs]
        pred, adj, traj = self._fwd(self.backbone_params, self.head_params,
                                    *map(jnp.asarray, arrs))
        return pred[:b], adj[:b], traj[:, :b]

    def forward_debug(self, batch: EpisodeBatch):
        """Single-dispatch debug forward returning
        (pred_norm [B, K, 2], raw_adj, similarity [B, K, gh, gw],
        attn_maps [L, B, K, HW]) — the reference's return_attn_map path
        (encoder_decoder.py:391-392) for plot_attn/plot_heatmap renders.
        Not jitted for the mesh path; debug only."""
        if getattr(self, "_debug_fwd", None) is not None:
            fwd = self._debug_fwd
            return fwd(self.backbone_params, self.head_params,
                       jnp.asarray(batch.img_s), jnp.asarray(batch.img_q),
                       jnp.asarray(batch.target_s),
                       jnp.asarray(batch.weight_s),
                       jnp.asarray(batch.binary_adj))
        model = self.model
        bb_cfg = self.backbone_cfg
        dtype = jnp.dtype(self.cfg.model.compute_dtype)

        @jax.jit
        def fwd(bb_params, head_params, img_s, img_q, target_s, weight_s,
                binary_adj):
            b, s = img_s.shape[:2]
            imgs = jnp.concatenate(
                [img_s.reshape((b * s,) + img_s.shape[2:]), img_q], axis=0)
            feats = dinov2.extract_features(bb_params, imgs, bb_cfg,
                                            dtype=dtype, use_flash=False)
            gh, gw = feats.shape[1:3]
            feat_s = feats[:b * s].reshape(b, s, gh, gw, -1)
            feat_q = feats[b * s:]
            mask_s = jnp.prod(weight_s, axis=1)
            enc = model.apply({"params": head_params}, feat_q, feat_s,
                              target_s, mask_s, binary_adj,
                              method=type(model).encode)
            outputs, _, attn = model.apply(
                {"params": head_params}, enc.kp_tokens, enc.img_tokens,
                enc.proposals, enc.adj, enc.hop_stack, enc.kp_valid,
                enc.img_pos, return_attn=True, method=type(model).decode)
            return outputs[-1], enc.raw_adj, enc.similarity, attn

        self._debug_fwd = fwd   # cache: repeated calls must not recompile
        return fwd(self.backbone_params, self.head_params,
                   jnp.asarray(batch.img_s), jnp.asarray(batch.img_q),
                   jnp.asarray(batch.target_s),
                   jnp.asarray(batch.weight_s),
                   jnp.asarray(batch.binary_adj))

    # ------------------------------------------------------------- decode
    def decode_batch(self, pred_norm: np.ndarray,
                     batch: EpisodeBatch) -> dict:
        """Normalized predictions -> original-image coordinates + result
        records (reference head.decode, head.py:324-387)."""
        size = self.cfg.model.image_size
        coords = np.asarray(pred_norm) * size
        centers = batch.meta["query_center"]
        scales = batch.meta["query_scale"]
        preds_img = affine.transform_preds_batch(
            coords, centers, scales, (size, size),
            use_udp=self.cfg.test_data.use_udp)
        b, k = coords.shape[:2]
        all_preds = np.zeros((b, k, 3), np.float32)
        all_preds[:, :, :2] = preds_img
        all_preds[:, :, 2] = 1.0
        boxes = np.zeros((b, 6), np.float32)
        boxes[:, 0:2] = centers
        boxes[:, 2:4] = scales
        boxes[:, 4] = np.prod(scales * 200.0, axis=1)
        boxes[:, 5] = 1.0
        return {"preds": all_preds, "boxes": boxes,
                "image_paths": batch.meta["query_image_file"],
                "bbox_ids": batch.meta["bbox_id"]}
