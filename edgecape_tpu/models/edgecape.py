"""EdgeCape-TPU model: frozen-backbone few-shot keypoint detector with a
learned-skeleton graph-transformer head.

Behavioral spec: reference EdgeCape/models/detectors/EdgeCape.py (predict,
forward_train/forward_test) + keypoint_heads/head.py (TwoStageHead wiring)
+ encoder_decoder.py (TwoStageSupportRefineTransformer.forward).

Structure (all static shapes, batch-first):

  backbone features (models/dinov2.py, computed outside, frozen)
        |                         support heatmaps
        v                                |
  input_proj (img tokens)   pool_support_keypoints -> query_proj (kp tokens)
        |                                |
        |                    SkeletonPredictor -> adj, hop_stack
        v                                v
  joint encoder over [img ++ kp] tokens (3 layers)
        |                 |
        v                 v
  ProposalGenerator(img, kp) -> similarity, proposals
        |
        v
  Decoder (3 layers, GCN-FFN, optional Markov bias) -> per-layer coords

The masked-keypoint reconstruction branch (curriculum stage 2) is composed
at the train-step level: `encode` produces intermediates, `decode` is then
applied twice — once live, once with decoder params stop-gradiented and
masked tokens (see train/loop.py) — reproducing the reference's
requires_grad toggling (encoder_decoder.py:212-237) functionally.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops import pos_enc
from .head import pool_support_keypoints
from .skeleton import SkeletonPredictor
from .transformer import (Decoder, EncoderLayer, ProposalGenerator, dense)


class SupportContext(NamedTuple):
    """Everything derived from the support set alone — cacheable across the
    15 queries of an episode (the reference recomputes it per query)."""
    kp_tokens0: jnp.ndarray        # [B, K, C] pooled+projected kp tokens
    kp_valid: jnp.ndarray          # [B, K] bool
    mask_s: jnp.ndarray            # [B, K] float joint support visibility
    adj: jnp.ndarray               # [B, 2, K, K]
    hop_stack: Optional[jnp.ndarray]
    raw_adj: jnp.ndarray           # [B, K, K]


class EncodeOutput(NamedTuple):
    img_tokens: jnp.ndarray        # [B, HW, C] encoder-refined image tokens
    kp_tokens: jnp.ndarray         # [B, K, C] encoder-refined kp tokens
    kp_tokens_pre: jnp.ndarray     # [B, K, C] pooled+projected (pre-encoder)
    img_pos: jnp.ndarray           # [B, HW, C]
    kp_valid: jnp.ndarray          # [B, K] bool
    adj: jnp.ndarray               # [B, 2, K, K]
    hop_stack: Optional[jnp.ndarray]  # [B, K, K, max_hops+1] | None
    raw_adj: jnp.ndarray           # [B, K, K] learned edge weights
    proposals: jnp.ndarray         # [B, K, 2] working proposals (local)
    proposals_for_loss: jnp.ndarray  # [B, K, 2] global soft-argmax
    similarity: jnp.ndarray        # [B, K, gh, gw]
    spatial_hw: tuple


class ModelOutput(NamedTuple):
    outputs: jnp.ndarray           # [L, B, K, 2] per-layer predictions
    points: list                   # trajectory [initial, ...]
    encode: EncodeOutput


class EdgeCape(nn.Module):
    """Keypoint head over frozen backbone features."""

    cfg: ModelConfig

    def setup(self):
        c = self.cfg
        self.input_proj = dense(c.d_model, "input_proj")
        self.query_proj = dense(c.d_model, "query_proj")
        self.skeleton = SkeletonPredictor(
            d_model=c.d_model, nhead=c.nhead,
            num_layers=c.skeleton_num_layers,
            dim_feedforward=c.dim_feedforward, dropout=c.dropout,
            max_hop=c.max_hops, learn_skeleton=c.learn_skeleton,
            adj_normalization=c.adj_normalization,
            use_zero_conv=c.use_zero_conv, use_flash=c.use_flash,
            image_feat_dim=c.backbone_dim, name="skeleton")
        self.encoder_layers = [
            EncoderLayer(c.d_model, c.nhead, c.dim_feedforward, c.dropout,
                         use_flash=c.use_flash, name=f"enc{i}")
            for i in range(c.num_encoder_layers)]
        self.proposal_gen = ProposalGenerator(
            c.d_model, c.similarity_proj_dim, c.dynamic_proj_dim,
            name="proposal_gen")
        self.decoder = Decoder(
            c.d_model, c.nhead, c.dim_feedforward, c.num_decoder_layers,
            c.dropout, attn_bias=c.attn_bias, max_hops=c.max_hops,
            num_feats=c.num_feats, use_flash=c.use_flash, name="decoder")
        self.mask_token = self.param("mask_token", nn.initializers.zeros,
                                     (1, c.d_model))

    # ---------------------------------------------------- support phase
    def encode_support(self, feat_s, target_s, mask_s, binary_adj,
                       train: bool = False) -> SupportContext:
        """Support-only computation: heatmap-pooled keypoint tokens and the
        skeleton prediction. Depends on nothing from the query, so eval can
        cache it per episode (reference recomputes per query at bs=1).

        Args:
          feat_s: [B, S, gh, gw, Cb] support backbone features.
          target_s: [B, S, K, H, W] support GT heatmaps.
          mask_s: [B, K] joint support visibility (product over shots).
          binary_adj: [B, K, K] GT skeleton adjacency.
        """
        c = self.cfg
        b, s, gh, gw, _ = feat_s.shape
        hw = gh * gw
        img_pos = jnp.broadcast_to(
            pos_enc.sine_grid(gh, gw, c.num_feats).reshape(hw, c.d_model),
            (b, hw, c.d_model)).astype(feat_s.dtype)

        pooled = pool_support_keypoints(feat_s, target_s)      # [B, K, Cb]
        pooled = pooled * mask_s[..., None]
        kp_tokens0 = self.query_proj(pooled)
        kp_valid = mask_s > 0

        adj, hop_stack, raw_adj = self.skeleton(
            binary_adj, kp_tokens0, feat_s, kp_valid, img_pos, train=train)
        return SupportContext(kp_tokens0=kp_tokens0, kp_valid=kp_valid,
                              mask_s=mask_s, adj=adj, hop_stack=hop_stack,
                              raw_adj=raw_adj)

    # ------------------------------------------------------ query phase
    def encode_query(self, feat_q, ctx: SupportContext,
                     train: bool = False) -> EncodeOutput:
        """Joint encoder over [query image tokens ++ support kp tokens],
        then the proposal generator."""
        c = self.cfg
        b, gh, gw, _ = feat_q.shape
        hw = gh * gw
        img_tokens = self.input_proj(feat_q.reshape(b, hw, -1))
        img_pos = jnp.broadcast_to(
            pos_enc.sine_grid(gh, gw, c.num_feats).reshape(hw, c.d_model),
            (b, hw, c.d_model)).astype(img_tokens.dtype)

        kp_tokens0 = ctx.kp_tokens0
        k = kp_tokens0.shape[1]
        tokens = jnp.concatenate([img_tokens, kp_tokens0], axis=1)
        pos = jnp.concatenate(
            [img_pos, jnp.zeros((b, k, c.d_model), img_pos.dtype)], axis=1)
        valid = jnp.concatenate(
            [jnp.ones((b, hw), bool), ctx.kp_valid], axis=1)
        if c.use_flash and not train and not self.is_initializing():
            # fully-fused Pallas encoder layer (eval fast path): the
            # position map is row-independent, so it ships once per
            # program instead of inside the token stream
            from ..ops.fused_encoder import (fused_encoder_layer,
                                             fused_encoder_stack)
            from ..ops.pallas_config import (encoder_stack_default,
                                             interpret_default)
            interp = interpret_default()
            p = self.variables["params"]
            pos_row = pos[0]

            def layer_weights(i):
                lp = p[f"enc{i}"]
                at = lp["self_attn"]
                return (at["q_proj"]["kernel"], at["q_proj"]["bias"],
                        at["k_proj"]["kernel"], at["k_proj"]["bias"],
                        at["v_proj"]["kernel"], at["v_proj"]["bias"],
                        at["out_proj"]["kernel"], at["out_proj"]["bias"],
                        lp["norm1"]["scale"], lp["norm1"]["bias"],
                        lp["linear1"]["kernel"], lp["linear1"]["bias"],
                        lp["linear2"]["kernel"], lp["linear2"]["bias"],
                        lp["norm2"]["scale"], lp["norm2"]["bias"])

            if encoder_stack_default():
                # whole encoder in ONE Pallas program (bit-identical to
                # the per-layer chain; measured-perf switch)
                tokens = fused_encoder_stack(
                    tokens, pos_row, valid,
                    tuple(layer_weights(i)
                          for i in range(c.num_encoder_layers)),
                    num_heads=c.nhead, eps=1e-5, interpret=interp)
            else:
                for i in range(c.num_encoder_layers):
                    tokens = fused_encoder_layer(
                        tokens, pos_row, valid, *layer_weights(i),
                        num_heads=c.nhead, eps=1e-5, interpret=interp)
        else:
            for layer in self.encoder_layers:
                tokens = layer(tokens, pos, valid, train=train)
        enc_img, enc_kp = tokens[:, :hw], tokens[:, hw:]

        prop_loss, sim, proposals = self.proposal_gen(enc_img, enc_kp,
                                                      (gh, gw))
        return EncodeOutput(
            img_tokens=enc_img, kp_tokens=enc_kp, kp_tokens_pre=kp_tokens0,
            img_pos=img_pos, kp_valid=ctx.kp_valid, adj=ctx.adj,
            hop_stack=ctx.hop_stack, raw_adj=ctx.raw_adj,
            proposals=proposals, proposals_for_loss=prop_loss,
            similarity=sim.reshape(b, k, gh, gw), spatial_hw=(gh, gw))

    # ------------------------------------------------------------ encode
    def encode(self, feat_q, feat_s, target_s, mask_s, binary_adj,
               train: bool = False) -> EncodeOutput:
        """Full encode (support + query phases)."""
        ctx = self.encode_support(feat_s, target_s, mask_s, binary_adj,
                                  train=train)
        return self.encode_query(feat_q, ctx, train=train)

    # ------------------------------------------------------------ decode
    def decode(self, kp_tokens, img_tokens, proposals, adj, hop_stack,
               kp_valid, img_pos, train: bool = False,
               return_attn: bool = False):
        """Run the refinement decoder; returns ([L, B, K, 2] per-layer
        predictions via the head recompute, point trajectory[, attn maps
        [L, B, K, HW] when return_attn — reference return_attn_map,
        encoder_decoder.py:391-392])."""
        c = self.cfg
        from ..ops.pallas_config import decoder_stack_default
        if (c.use_flash and not train and not return_attn
                and not self.is_initializing()
                and decoder_stack_default()):
            # whole decoder + glue + head recompute in Pallas
            # (measured-perf switch; tolerance-equal to the layer chain)
            return self.decoder.decode_stacked(
                kp_tokens, img_tokens, kp_valid=kp_valid, img_pos=img_pos,
                initial_proposals=proposals, adj=adj, hop_stack=hop_stack)
        dec_out = self.decoder(
            kp_tokens, img_tokens, kp_valid=kp_valid, img_pos=img_pos,
            initial_proposals=proposals, adj=adj, hop_stack=hop_stack,
            train=train, return_attn=return_attn)
        if return_attn:
            inter, points, attn_maps = dec_out
        else:
            inter, points = dec_out
        # Head recompute (reference head.py:216-221): per-layer delta from
        # the *normed* tokens plus inverse-sigmoid of that layer's input
        # coords, WITHOUT the inter-layer stop_gradient.
        from .transformer import inverse_sigmoid
        outs = []
        for idx in range(inter.shape[0]):
            delta = self.decoder.kpt_branches[idx](inter[idx])
            outs.append(jax.nn.sigmoid(delta + inverse_sigmoid(points[idx])))
        if return_attn:
            return jnp.stack(outs, axis=0), points, attn_maps
        return jnp.stack(outs, axis=0), points

    def mask_tokens(self, kp_tokens, random_mask, kp_valid):
        """Replace masked valid keypoints with the learnable mask token
        (reference encoder_decoder.py:214-218). random_mask [B, K]: 1 keep,
        0 mask."""
        keep = random_mask[..., None]
        tok = jax.lax.stop_gradient(kp_tokens) * keep
        fill = (1.0 - keep) * kp_valid[..., None] * self.mask_token
        return tok + fill

    # ------------------------------------------------------------ full
    def __call__(self, feat_q, feat_s, target_s, mask_s, binary_adj,
                 train: bool = False) -> ModelOutput:
        enc = self.encode(feat_q, feat_s, target_s, mask_s, binary_adj,
                          train=train)
        outputs, points = self.decode(
            enc.kp_tokens, enc.img_tokens, enc.proposals, enc.adj,
            enc.hop_stack, enc.kp_valid, enc.img_pos, train=train)
        return ModelOutput(outputs=outputs, points=points, encode=enc)


def init_model(rng: jax.Array, cfg: ModelConfig, *, batch: int = 1,
               shots: int = 1):
    """Initialize head parameters with dummy shapes."""
    g = cfg.image_size // cfg.patch_size
    model = EdgeCape(cfg)
    variables = model.init(
        {"params": rng, "dropout": jax.random.PRNGKey(0)},
        jnp.zeros((batch, g, g, cfg.backbone_dim)),
        jnp.zeros((batch, shots, g, g, cfg.backbone_dim)),
        jnp.zeros((batch, shots, cfg.max_kpt, cfg.heatmap_size,
                   cfg.heatmap_size)),
        jnp.zeros((batch, cfg.max_kpt)),
        jnp.zeros((batch, cfg.max_kpt, cfg.max_kpt)),
    )
    return model, variables["params"]
