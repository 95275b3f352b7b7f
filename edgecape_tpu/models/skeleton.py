"""Skeleton predictor: learned continuous edge weights + Markov hop stack.

Behavioral spec: reference EdgeCape/models/keypoint_heads/skeleton.py
(SkeletonPredictor). Given pooled support keypoint tokens and raw support
image features, refine the tokens with two-way graph-decoder layers, take a
cosine-similarity Gram matrix, pass it through a zero-initialized scalar
conv, add the GT binary adjacency, ReLU, and soft row-normalize. The
row-stochastic matrix powers 0..max_hop form the structural attention bias.

TPU redesign: shots are folded into the batch axis for the refine layers
(one [B*S, K, C] pass instead of a per-shot Python loop) and the hop powers
are computed channels-last in fp32 (ops/graph.py).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..ops import graph
from .transformer import DecoderLayer, dense, ensure_some_valid


class SkeletonPredictor(nn.Module):
    d_model: int = 256
    nhead: int = 8
    num_layers: int = 3
    dim_feedforward: int = 384
    dropout: float = 0.1
    max_hop: int = 4
    learn_skeleton: bool = False
    adj_normalization: bool = True
    use_zero_conv: bool = True
    use_flash: bool = False
    image_feat_dim: int = 384  # backbone channels fed to image_project

    @nn.compact
    def __call__(self, binary_adj, kp_tokens, support_feats, kp_valid,
                 img_pos, train: bool = False):
        """
        Args:
          binary_adj: [B, K, K] symmetric 0/1 GT skeleton adjacency.
          kp_tokens: [B, K, C] pooled+projected support keypoint tokens.
          support_feats: [B, S, gh, gw, image_feat_dim] raw backbone feats.
          kp_valid: [B, K] bool.
          img_pos: [B, gh*gw, C] sine positional map for the image tokens.
        Returns:
          adj [B, 2, K, K] (diag(valid); row-normalized edge weights),
          hop_stack [B, K, K, max_hop+1] or None (GT-skeleton mode),
          raw_adj [B, K, K] — unnormalized learned weights (binary GT when
          not learning), for visualization/eval output.
        """
        kp_invalid = ~kp_valid
        gt_norm = graph.normalize_adjacency(binary_adj, kp_invalid)
        if not self.learn_skeleton:
            return gt_norm, None, (binary_adj > 0).astype(jnp.float32)

        b, s, gh, gw, _ = support_feats.shape
        k = kp_tokens.shape[1]
        c = self.d_model

        # ---- refine keypoint tokens against each support image (two-way)
        refine_adj = graph.soft_normalize_adjacency(
            binary_adj.astype(kp_tokens.dtype), kp_invalid,
            normalize=self.adj_normalization, stack_diag=True)
        img_tokens = dense(self.d_model, "image_project")(
            support_feats.reshape(b, s, gh * gw, -1))        # [B,S,HW,C]

        layers = [DecoderLayer(self.d_model, self.nhead, self.dim_feedforward,
                               self.dropout, two_way_attn=True,
                               use_flash=self.use_flash,
                               name=f"refine{i}")
                  for i in range(self.num_layers)]

        # fold shots into batch: identical math to the reference's per-shot
        # loop because layer weights are shared across shots.
        x = jnp.repeat(kp_tokens[:, None], s, axis=1).reshape(b * s, k, c)
        img = img_tokens.reshape(b * s, gh * gw, c)
        adj_rep = jnp.repeat(refine_adj[:, None], s, axis=1).reshape(
            b * s, 2, k, k)
        valid_rep = jnp.repeat(kp_valid[:, None], s, axis=1).reshape(b * s, k)
        valid_rep = ensure_some_valid(valid_rep)
        zero_pos = jnp.zeros_like(x)
        img_pos_rep = jnp.repeat(img_pos[:, None], s, axis=1).reshape(
            b * s, gh * gw, c)
        for layer in layers:
            x, img = layer(x, img, kp_valid=valid_rep, kp_query_pos=zero_pos,
                           img_pos=img_pos_rep, adj=adj_rep, train=train)
        refined = x.reshape(b, s, k, c).mean(axis=1)          # [B, K, C]

        # ---- cosine Gram -> zero-conv -> +GT -> ReLU -> normalize
        unit = refined / (jnp.linalg.norm(refined, axis=-1, keepdims=True)
                          + 1e-8)
        gram = jnp.einsum("bkc,blc->bkl", unit, unit,
                          preferred_element_type=jnp.float32)
        gram = 0.5 * (gram + gram.transpose(0, 2, 1))
        if self.use_zero_conv:
            # 1x1 conv on a 1-channel map == scalar scale+bias, zero-init
            w = self.param("zero_conv_w", nn.initializers.zeros, (1,))
            bias = self.param("zero_conv_b", nn.initializers.zeros, (1,))
            gram = gram * w[0] + bias[0]
        combined = binary_adj.astype(gram.dtype) + gram
        combined = nn.relu(combined)
        adj = graph.soft_normalize_adjacency(
            combined, kp_invalid, normalize=self.adj_normalization,
            stack_diag=True)
        valid_f = kp_valid.astype(combined.dtype)
        raw_adj = combined * valid_f[:, :, None] * valid_f[:, None, :]

        hop_stack = graph.markov_hop_stack(adj[:, 1], self.max_hop)
        return adj, hop_stack, raw_adj
