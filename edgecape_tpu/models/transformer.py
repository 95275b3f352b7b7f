"""Graph-transformer core: joint encoder, proposal generator, and the
GCN-FFN decoder with optional Markov structural attention bias.

Behavioral spec: reference EdgeCape/models/keypoint_heads/encoder_decoder.py
(TwoStageSupportRefineTransformer, TransformerEncoder/DecoderLayer, GCNLayer,
ProposalGenerator) and models/utils/bias_attn.py (BiasedMultiheadAttention).

TPU-first redesign decisions:
* batch-first [B, N, C] everywhere (no seq-first transposes);
* one fused attention primitive with additive bias + key-validity masks
  (covers plain MHA, the fairseq-derived biased MHA, and the 2*d_model
  concat-position cross-attention via explicit q/k/v input dims);
* static shapes: K is padded to max_kpt, invalid keypoints carried as masks;
* hop-power bias stack is channels-last [B, K, K, max_hops+1] so the bias
  MLP is a single matmul over the trailing axis.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import pos_enc, softargmax

xavier = nn.initializers.xavier_uniform
zeros_init = nn.initializers.zeros


def lnorm(name: str):
    """LayerNorm with torch's eps (1e-5, not flax's 1e-6) — keeps converted
    reference checkpoints bit-faithful through the many post-norms."""
    return nn.LayerNorm(epsilon=1e-5, name=name)


def dense(feats: int, name: str):
    return nn.Dense(feats, kernel_init=xavier(), bias_init=zeros_init,
                    name=name)


# canonical definition lives with the coordinate helpers; re-exported
# here because model code and the reference map both know it by this
# module
from ..ops.pos_enc import inverse_sigmoid  # noqa: F401, E402


def ensure_some_valid(valid: jnp.ndarray) -> jnp.ndarray:
    """If a row has no valid keypoints, mark index 0 valid — the all-padded
    fix of reference encoder_decoder.py:359-360 (keeps softmax finite)."""
    none_valid = ~valid.any(axis=-1, keepdims=True)
    first = jnp.zeros_like(valid).at[..., 0].set(True)
    return valid | (none_valid & first)


class MultiHeadAttention(nn.Module):
    """torch.nn.MultiheadAttention-equivalent math, batch-first.

    Supports distinct q/k/v input widths (the concat-position cross-attention
    uses q,k of 2*d_model with values of d_model) and an additive pre-softmax
    logit bias (the Markov structural bias)."""

    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    use_flash: bool = False  # Pallas fused path (eval self-attn, TPU)

    @nn.compact
    def __call__(self, q_in, k_in, v_in, *, key_valid=None, bias=None,
                 train: bool = False, return_probs: bool = False):
        b, nq, _ = q_in.shape
        nk = k_in.shape[1]
        h = self.num_heads
        hd = self.embed_dim // h

        q = dense(self.embed_dim, "q_proj")(q_in)
        k = dense(self.embed_dim, "k_proj")(k_in)
        v = dense(self.embed_dim, "v_proj")(v_in)
        q = q.reshape(b, nq, h, hd)
        k = k.reshape(b, nk, h, hd)
        v = v.reshape(b, nk, h, hd)

        # fused kernel: no additive head bias, no attention-prob dropout
        # (eval), no prob extraction (debug only). The kernel supports
        # cross-attention (nq != nk) but at the decoder's small query
        # counts XLA's batched matmul wins, so the fused path is applied
        # to self-attention shapes only.
        if (self.use_flash and nq == nk and bias is None and not train
                and not return_probs):
            from ..ops.flash_attention import flash_mha
            from ..ops.pallas_config import interpret_default
            out = flash_mha(q, k, v, key_valid,
                            interpret=interpret_default()).reshape(
                b, nq, self.embed_dim)
            return dense(self.embed_dim, "out_proj")(out)

        # TRAIN fused path: custom_vjp Pallas kernels (fwd + recompute
        # bwd, no HBM prob materialization), supporting the additive
        # Markov bias (real dbias) and in-kernel attention-prob dropout
        # (flash_attention.py flash_mha_train)
        if (self.use_flash and nq == nk and nq <= 512 and train
                and not return_probs):
            from ..ops.flash_attention import flash_mha_train
            from ..ops.pallas_config import interpret_default
            rng = (self.make_rng("dropout") if self.dropout > 0.0
                   else None)
            out = flash_mha_train(
                q, k, v, key_valid, bias, dropout_rate=self.dropout,
                dropout_rng=rng,
                interpret=interpret_default()).reshape(
                b, nq, self.embed_dim)
            return dense(self.embed_dim, "out_proj")(out)

        logits = jnp.einsum("bqhd,bkhd->bhqk", q * (hd ** -0.5), k,
                            preferred_element_type=jnp.float32)
        if bias is not None:
            logits = logits + bias.astype(logits.dtype)
        if key_valid is not None:
            neg = jnp.finfo(logits.dtype).min
            logits = jnp.where(key_valid[:, None, None, :], logits, neg)
        probs = jax.nn.softmax(logits, axis=-1).astype(q_in.dtype)
        probs = nn.Dropout(self.dropout, deterministic=not train)(probs)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(
            b, nq, self.embed_dim)
        out = dense(self.embed_dim, "out_proj")(out)
        if return_probs:
            # torch need_weights semantics: probabilities averaged over
            # heads (reference decoder attn_map, encoder_decoder.py:624)
            return out, jnp.mean(probs, axis=1)
        return out


class MarkovBiasMLP(nn.Module):
    """Hop-power stack [B, K, K, max_hops+1] -> per-head logit bias
    [B, nheads, K, K] (reference bias_attn.py:81-83,188-191)."""

    num_heads: int
    max_hops: int

    @nn.compact
    def __call__(self, hops):
        x = dense(self.max_hops + self.num_heads, "fc1")(hops)
        x = nn.relu(x)
        x = dense(self.num_heads, "fc2")(x)
        return x.transpose(0, 3, 1, 2)


class EncoderLayer(nn.Module):
    """Post-norm self-attention + FFN; position embedding added to q, k AND
    v (reference encoder_decoder.py:461-483)."""

    d_model: int
    nhead: int
    dim_feedforward: int
    dropout: float = 0.1
    use_flash: bool = False

    @nn.compact
    def __call__(self, tokens, pos, key_valid, train: bool = False):
        src = tokens + pos
        att = MultiHeadAttention(self.d_model, self.nhead, self.dropout,
                                 use_flash=self.use_flash,
                                 name="self_attn")(
            src, src, src, key_valid=key_valid, train=train)
        x = src + nn.Dropout(self.dropout, deterministic=not train)(att)
        x = lnorm("norm1")(x)
        f = dense(self.dim_feedforward, "linear1")(x)
        f = nn.Dropout(self.dropout, deterministic=not train)(nn.relu(f))
        f = dense(self.d_model, "linear2")(f)
        x = x + nn.Dropout(self.dropout, deterministic=not train)(f)
        return lnorm("norm2")(x)


class ProposalGenerator(nn.Module):
    """Dynamic similarity proposals (reference encoder_decoder.py:37-112):
    tanh-modulated support projection, full-map soft-argmax for the loss
    proposal, local 3x3 re-normalized soft-argmax for the working proposal."""

    d_model: int
    proj_dim: int
    dynamic_proj_dim: int

    @nn.compact
    def __call__(self, query_tokens, support_tokens, spatial_hw):
        h, w = spatial_hw
        fs = dense(self.proj_dim, "support_proj")(support_tokens)  # [B,K,P]
        fq = dense(self.proj_dim, "query_proj")(query_tokens)      # [B,HW,P]
        dyn = dense(self.dynamic_proj_dim, "dynamic_fc1")(fs)
        dyn = dense(self.d_model, "dynamic_fc2")(nn.relu(dyn))
        fs = (jnp.tanh(dyn) + 1.0) * fs
        sim = jnp.einsum("bpc,bkc->bkp", fq, fs,
                         preferred_element_type=jnp.float32)  # [B, K, HW]
        proposal_for_loss = softargmax.global_soft_argmax(sim, h, w)
        proposals = softargmax.local_soft_argmax(sim, h, w)
        return proposal_for_loss, sim, proposals


class GCNLayer(nn.Module):
    """Graph-conv FFN: pointwise expansion to kernel_size slices contracted
    with the 2-slice adjacency [diag(valid); edge-weights]
    (reference GCNLayer, encoder_decoder.py:486-524)."""

    out_features: int
    kernel_size: int = 2

    @nn.compact
    def __call__(self, x, adj):
        # x [B, K, C]; adj [B, kernel_size, K, K]
        b, k, _ = x.shape
        y = dense(self.out_features * self.kernel_size, "conv")(x)
        y = y.reshape(b, k, self.kernel_size, self.out_features)
        out = jnp.einsum("bvsc,bswv->bwc", y, adj,
                         preferred_element_type=jnp.float32)
        return nn.relu(out).astype(x.dtype)


class DecoderLayer(nn.Module):
    """Keypoint-token refinement block (reference encoder_decoder.py:527-651):
    (1) kp self-attention, optionally biased by the Markov hop stack;
    (2) cross-attention kp->image with concat([content; position]) q/k at
        2*d_model and d_model values, squeezed back by a 'choker' projection;
    (3) GCN feed-forward contracting with the learned adjacency;
    (4) optional two-way image<-kp cross-attention (skeleton refiner only).
    """

    d_model: int
    nhead: int
    dim_feedforward: int
    dropout: float = 0.1
    attn_bias: bool = False
    max_hops: int = 4
    two_way_attn: bool = False
    use_flash: bool = False

    @nn.compact
    def __call__(self, kp_tokens, img_tokens, *, kp_valid, kp_query_pos,
                 img_pos, hop_stack=None, adj=None, train: bool = False,
                 return_attn: bool = False):
        drop = lambda x: nn.Dropout(self.dropout,  # noqa: E731
                                    deterministic=not train)(x)
        # (1) keypoint self-attention
        bias = None
        if self.attn_bias and hop_stack is not None:
            bias = MarkovBiasMLP(self.nhead, self.max_hops,
                                 name="bias_mlp")(hop_stack)
        att = MultiHeadAttention(self.d_model, self.nhead, self.dropout,
                                 use_flash=self.use_flash,
                                 name="self_attn")(
            kp_tokens, kp_tokens, kp_tokens, key_valid=kp_valid, bias=bias,
            train=train)
        x = kp_tokens + drop(att)
        x = lnorm("norm1")(x)

        # (2) cross-attention with concatenated positional embedding
        q = jnp.concatenate([x, kp_query_pos], axis=-1)
        k = jnp.concatenate([img_tokens, img_pos], axis=-1)
        cross = MultiHeadAttention(2 * self.d_model, self.nhead,
                                   self.dropout, use_flash=self.use_flash,
                                   name="cross_attn")
        attn_map = None
        if return_attn:
            # reference img_attn_map (encoder_decoder.py:624-628): the
            # kp->image cross-attention probabilities, head-averaged
            att, attn_map = cross(q, k, img_tokens, train=train,
                                  return_probs=True)
        else:
            att = cross(q, k, img_tokens, train=train)
        att = dense(self.d_model, "choker")(att)
        x = x + drop(att)
        x = lnorm("norm2")(x)

        # (3) GCN feed-forward
        f = GCNLayer(self.dim_feedforward, name="gcn")(x, adj)
        f = dense(self.d_model, "ffn2")(drop(f))
        x = x + drop(f)
        x = lnorm("norm3")(x)

        # (4) two-way: image tokens attend back to keypoint tokens
        if self.two_way_attn:
            q2 = jnp.concatenate([img_tokens, img_pos], axis=-1)
            k2 = jnp.concatenate([x, kp_query_pos], axis=-1)
            att2 = MultiHeadAttention(2 * self.d_model, self.nhead,
                                      self.dropout,
                                      use_flash=self.use_flash,
                                      name="two_way_attn")(
                q2, k2, x, train=train)
            att2 = dense(self.d_model, "two_way_choker")(att2)
            img_tokens = img_tokens + drop(att2)
            img_tokens = lnorm("norm4")(img_tokens)

        if return_attn:
            return x, img_tokens, attn_map
        return x, img_tokens


def _markov_bias_fn(lp, hops):
    """Functional MarkovBiasMLP over its param subtree (for the fused
    decoder path): hops [B, K, K, max_hops+1] -> [B, H, K, K]."""
    h = hops @ lp["fc1"]["kernel"] + lp["fc1"]["bias"]
    h = jax.nn.relu(h)
    h = h @ lp["fc2"]["kernel"] + lp["fc2"]["bias"]
    return h.transpose(0, 3, 1, 2).astype(jnp.float32)


class RefPointHead(nn.Module):
    """2-layer MLP over the sine embedding of current coords
    (reference TransformerDecoder.ref_point_head)."""

    d_model: int

    @nn.compact
    def __call__(self, x):
        x = nn.gelu(dense(self.d_model, "fc1")(x), approximate=False)
        return dense(self.d_model, "fc2")(x)


class KptBranch(nn.Module):
    """Per-layer coordinate-delta MLP (reference TokenDecodeMLP,
    head.py:34-58): 3x (Linear+GELU) then a zero-initialized final Linear."""

    d_model: int

    @nn.compact
    def __call__(self, x):
        for i in range(3):
            x = nn.gelu(dense(self.d_model, f"fc{i}")(x), approximate=False)
        return nn.Dense(2, kernel_init=zeros_init, bias_init=zeros_init,
                        name="out")(x)


class Decoder(nn.Module):
    """Iterative-refinement decoder (reference encoder_decoder.py:313-431).

    Per layer: sine-embed current coords -> ref_point_head -> DecoderLayer ->
    kpt_branch delta -> sigmoid(inverse_sigmoid(prev) + delta), with
    stop_gradient between layers. Returns per-layer normed tokens and the
    point trajectory [initial, after L0, after L1, ...].
    """

    d_model: int
    nhead: int
    dim_feedforward: int
    num_layers: int
    dropout: float = 0.1
    attn_bias: bool = False
    max_hops: int = 4
    num_feats: int = 128
    use_flash: bool = False

    def setup(self):
        self.layers = [
            DecoderLayer(self.d_model, self.nhead, self.dim_feedforward,
                         self.dropout, attn_bias=self.attn_bias,
                         max_hops=self.max_hops, use_flash=self.use_flash,
                         name=f"layer{i}")
            for i in range(self.num_layers)]
        self.norm = lnorm("norm")
        self.ref_point_head = RefPointHead(self.d_model)
        self.kpt_branches = [KptBranch(self.d_model, name=f"kpt_branch{i}")
                             for i in range(self.num_layers)]

    def __call__(self, kp_tokens, img_tokens, *, kp_valid, img_pos,
                 initial_proposals, adj, hop_stack=None, train: bool = False,
                 return_attn: bool = False):
        kp_valid = ensure_some_valid(kp_valid)
        # coordinate trajectory stays fp32 even when tokens run bf16
        # (head_dtype fast path): sub-pixel resolution matters here
        bi = jax.lax.stop_gradient(initial_proposals.astype(jnp.float32))
        points = [bi]
        intermediate = []
        attn_maps = []
        x = kp_tokens
        # fully-fused Pallas decoder layer (eval fast path, no attn-map
        # extraction); the tiny Markov-bias MLP stays in XLA
        use_fused = (self.use_flash and not train and not return_attn
                     and not self.is_initializing())
        if use_fused:
            from ..ops.fused_decoder import fused_decoder_layer
            from ..ops.pallas_config import interpret_default
            interp = interpret_default()
            p = self.variables["params"]
            b, k = x.shape[:2]
        for i, layer in enumerate(self.layers):
            query_pos = pos_enc.sine_coords(bi, self.num_feats).astype(
                x.dtype)
            query_pos = self.ref_point_head(query_pos)
            if use_fused:
                lp = p[f"layer{i}"]
                if self.attn_bias and hop_stack is not None:
                    bias = _markov_bias_fn(lp["bias_mlp"], hop_stack)
                else:
                    bias = jnp.zeros((b, self.nhead, k, k), jnp.float32)
                x = fused_decoder_layer(
                    x, query_pos, img_tokens, img_pos[0], kp_valid, bias,
                    adj, lp, num_heads=self.nhead, eps=1e-5,
                    interpret=interp)
            else:
                out = layer(
                    x, img_tokens, kp_valid=kp_valid,
                    kp_query_pos=query_pos, img_pos=img_pos,
                    hop_stack=hop_stack, adj=adj, train=train,
                    return_attn=return_attn)
                if return_attn:
                    x, img_tokens, attn_map = out
                    attn_maps.append(attn_map)
                else:
                    x, img_tokens = out
            intermediate.append(self.norm(x))
            delta = self.kpt_branches[i](x)
            bi_pred = jax.nn.sigmoid(inverse_sigmoid(bi) + delta)
            bi = jax.lax.stop_gradient(bi_pred)
            points.append(bi_pred)
        if return_attn:
            return jnp.stack(intermediate, axis=0), points, \
                jnp.stack(attn_maps, axis=0)
        return jnp.stack(intermediate, axis=0), points

    def decode_stacked(self, kp_tokens, img_tokens, *, kp_valid, img_pos,
                       initial_proposals, adj, hop_stack=None):
        """Eval fast path: the whole decoder — layer chunks plus ALL
        inter-layer glue (bias MLP, sine+ref_point_head, kpt_branch,
        trajectory update, final-norm head recompute) — in Pallas
        (ops/fused_decoder.fused_decoder_stack). Returns the
        head-recompute predictions [L, B, K, 2] and the points
        trajectory list, exactly decode()'s contract
        (reference encoder_decoder.py:313-431 + head.py:216-221)."""
        from ..ops.fused_decoder import fused_decoder_stack
        from ..ops.pallas_config import interpret_default
        kp_valid = ensure_some_valid(kp_valid)
        bi = jax.lax.stop_gradient(initial_proposals.astype(jnp.float32))
        p = self.variables["params"]
        layer_params = tuple(
            {"dec": p[f"layer{i}"], "kpt": p[f"kpt_branch{i}"],
             **({"bias_mlp": p[f"layer{i}"]["bias_mlp"]}
                if self.attn_bias and hop_stack is not None else {})}
            for i in range(self.num_layers))
        outputs, points_arr = fused_decoder_stack(
            kp_tokens, bi, img_tokens, img_pos[0], kp_valid,
            hop_stack if self.attn_bias else None, adj, layer_params,
            p["ref_point_head"], p["norm"], num_heads=self.nhead,
            num_feats=self.num_feats, eps=1e-5,
            interpret=interpret_default())
        points = [bi] + [points_arr[i]
                         for i in range(points_arr.shape[0])]
        return outputs, points
