"""Fully-fused graph-decoder layer (Pallas, TPU).

One kernel per DecoderLayer (models/transformer.py:193-259 — the
reference TransformerDecoderLayer, encoder_decoder.py:527-651) in eval
mode: (1) biased keypoint self-attention, (2) concat-position 2*d_model
cross-attention with the choker squeeze, (3) the GCN feed-forward
contracting with the per-episode adjacency, and the three post-norms —
all without leaving VMEM. The XLA form is fusion-bound: at K=100 tokens
the per-op tensors are tiny, so kernel-launch/HBM overheads dominate.

Eval-path kernel (no dropout); bf16 matmuls with fp32 accumulation and
fp32 LayerNorm statistics and softmax, tolerance-tested against the flax
layer. The Markov logit bias arrives precomputed ([B, H, K, K], fp32) —
its 5-wide MLP is left to XLA.

`fused_decoder_stack` (round 4) goes further: it runs a CHUNK of
decoder layers — plus ALL the inter-layer glue that the chained form
leaves to XLA between programs — inside one Pallas program:

* the Markov bias MLP, computed in-kernel from the hop-power stack
  (the XLA form materializes a [B, K, K, 12] fp32 intermediate and a
  [B, H, K, K] transpose PER LAYER — hundreds of MB of HBM traffic
  that the kernel never pays);
* the sine coordinate embedding + ref_point_head (the sin/cos lane
  interleave is folded into a pre-permuted fc1 so the kernel only
  computes plain sin/cos blocks);
* the per-layer kpt_branch, BOTH evaluations (trajectory delta from
  the raw tokens, head-recompute delta from the final-normed tokens,
  reference head.py:216-221), and the fp32 sigmoid coordinate update.

Layer chunks are sized so all chunk weights stay VMEM-resident
(~3.7 MB bf16 per layer at d_model 256); (tokens, coords) round-trip
HBM only at chunk boundaries. Tolerance-tested (not bit-exact; the
numeric deltas vs the chained path are: the hop-power stack rounds to
bf16 on the host where _markov_bias_fn consumes fp32 — the dominant
term for attn_bias configs — plus bf16-rounded ref_point_head /
kpt_branch weights and an |err|<=1.5e-7 polynomial erf in the exact
GELU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# the coordinate-update inverse shared with the flax trajectory
# (models/transformer.py re-exports it) — one definition, so an eps
# change cannot desynchronize the Pallas and flax trajectories
from .pos_enc import inverse_sigmoid as _invsig


def _kernel(x_ref, qpos_ref, img_ref, ipos_ref, kb_ref, bias_ref, adj_ref,
            wsq_ref, bsq_ref, wsk_ref, bsk_ref, wsv_ref, bsv_ref,
            wso_ref, bso_ref, ln1s_ref, ln1b_ref,
            wcq_ref, bcq_ref, wck_ref, bck_ref, wcv_ref, bcv_ref,
            wco_ref, bco_ref, wch_ref, bch_ref, ln2s_ref, ln2b_ref,
            wg_ref, bg_ref, wf_ref, bf_ref, ln3s_ref, ln3b_ref,
            o_ref, *, eps: float, num_heads: int):
    # Rows are processed in groups: projections / norms / FFN run as one
    # stacked [G*Kp, ...] matmul (MXU-efficient); only the attention
    # contractions and the adjacency contraction loop per (row, head).
    gsz, kp, c = x_ref.shape
    hw = img_ref.shape[1]
    d = c // num_heads
    c2 = 2 * c
    d2 = c2 // num_heads
    ipos = ipos_ref[0].astype(jnp.bfloat16)

    def layer_norm(xf, s_ref, b_ref):
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean((xf - mean) ** 2, axis=-1, keepdims=True)
        h = (xf - mean) * jax.lax.rsqrt(var + eps)
        return h * s_ref[0].astype(jnp.float32) + b_ref[0].astype(
            jnp.float32)

    def matmul(a, w_ref, b_ref):
        y = jax.lax.dot_general(
            a, w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return y + b_ref[0].astype(jnp.float32)

    xall = x_ref[:].astype(jnp.bfloat16).reshape(gsz * kp, c)

    # ---- (1) biased self-attention over keypoint tokens
    q = matmul(xall, wsq_ref, bsq_ref).astype(jnp.bfloat16)
    k = matmul(xall, wsk_ref, bsk_ref).astype(jnp.bfloat16)
    v = matmul(xall, wsv_ref, bsv_ref).astype(jnp.bfloat16)
    att_rows = []
    for g in range(gsz):
        row = slice(g * kp, (g + 1) * kp)
        kb = kb_ref[g]                                     # [1, Kp]
        outs = []
        for hi in range(num_heads):
            sl = slice(hi * d, (hi + 1) * d)
            s = jax.lax.dot_general(
                q[row, sl], k[row, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * (d ** -0.5)
            s = s + bias_ref[g, hi] + kb
            s = s - jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s)
            p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(
                jnp.bfloat16)
            outs.append(jax.lax.dot_general(
                p, v[row, sl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16))
        att_rows.append(jnp.concatenate(outs, axis=1))
    att = matmul(jnp.concatenate(att_rows, axis=0), wso_ref, bso_ref)
    x1 = layer_norm(xall.astype(jnp.float32) + att, ln1s_ref, ln1b_ref)

    # ---- (2) concat-position cross-attention to image tokens
    imgall = img_ref[:].astype(jnp.bfloat16).reshape(gsz * hw, c)
    qpos = qpos_ref[:].astype(jnp.bfloat16).reshape(gsz * kp, c)
    qc = jnp.concatenate([x1.astype(jnp.bfloat16), qpos], axis=1)
    kc = jnp.concatenate(
        [imgall, jnp.broadcast_to(ipos[None], (gsz, hw, c)).reshape(
            gsz * hw, c)], axis=1)
    q2 = matmul(qc, wcq_ref, bcq_ref).astype(jnp.bfloat16)
    k2 = matmul(kc, wck_ref, bck_ref).astype(jnp.bfloat16)
    v2 = matmul(imgall, wcv_ref, bcv_ref).astype(jnp.bfloat16)
    att_rows = []
    for g in range(gsz):
        row = slice(g * kp, (g + 1) * kp)
        irow = slice(g * hw, (g + 1) * hw)
        outs = []
        for hi in range(num_heads):
            sl = slice(hi * d2, (hi + 1) * d2)
            s = jax.lax.dot_general(
                q2[row, sl], k2[irow, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * (d2 ** -0.5)
            s = s - jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s)
            p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(
                jnp.bfloat16)
            outs.append(jax.lax.dot_general(
                p, v2[irow, sl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16))
        att_rows.append(jnp.concatenate(outs, axis=1))
    att2 = matmul(jnp.concatenate(att_rows, axis=0), wco_ref,
                  bco_ref).astype(jnp.bfloat16)            # [G*Kp, 2C]
    att2 = matmul(att2, wch_ref, bch_ref)                  # choker -> C
    x2 = layer_norm(x1 + att2, ln2s_ref, ln2b_ref)

    # ---- (3) GCN feed-forward with the 2-slice adjacency
    y = matmul(x2.astype(jnp.bfloat16), wg_ref, bg_ref)    # [G*Kp, 2F]
    f_dim = y.shape[1] // 2
    y = y.astype(jnp.bfloat16)
    m_rows = []
    for g in range(gsz):
        row = slice(g * kp, (g + 1) * kp)
        a0 = adj_ref[g, 0].astype(jnp.bfloat16)            # [Kp, Kp]
        a1 = adj_ref[g, 1].astype(jnp.bfloat16)
        m_rows.append(
            jax.lax.dot_general(a0, y[row, :f_dim],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
            + jax.lax.dot_general(a1, y[row, f_dim:],
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32))
    f = jnp.maximum(jnp.concatenate(m_rows, axis=0), 0.0).astype(
        jnp.bfloat16)                                      # [G*Kp, F]
    f = matmul(f, wf_ref, bf_ref)                          # [G*Kp, C]
    o_ref[:] = layer_norm(x2 + f, ln3s_ref, ln3b_ref).reshape(
        gsz, kp, c).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "eps",
                                             "interpret"))
def fused_decoder_layer(x, query_pos, img_tokens, img_pos, kp_valid, bias,
                        adj, params, *, num_heads: int, eps: float = 1e-5,
                        interpret: bool = False):
    """One graph-decoder layer. x/query_pos: [B, K, C]; img_tokens:
    [B, HW, C]; img_pos: [HW, C] (shared); kp_valid: [B, K] bool;
    bias: [B, H, K, K] additive self-attention logits (zeros when the
    Markov bias is off); adj: [B, 2, K, K]; params: the flax DecoderLayer
    param subtree. Returns [B, K, C] in x.dtype."""
    b, k, c = x.shape
    hw = img_tokens.shape[1]
    # 128-lane alignment measures faster than sublane-only padding (the
    # [Kp, Kp] score/adjacency blocks are lane-tiled on Kp)
    k_pad = ((k + 127) // 128) * 128
    f2 = params["gcn"]["conv"]["kernel"].shape[1]

    def padk(a, axis):
        pad = [(0, 0)] * a.ndim
        pad[axis] = (0, k_pad - k)
        return jnp.pad(a, pad) if k_pad != k else a

    xt = padk(x.astype(jnp.bfloat16), 1)
    qp = padk(query_pos.astype(jnp.bfloat16), 1)
    kb = jnp.where(kp_valid, 0.0, -jnp.inf).astype(jnp.float32)
    kb = jnp.pad(kb, [(0, 0), (0, k_pad - k)], constant_values=-jnp.inf)
    kb = kb[:, None, :]
    bias_p = padk(padk(bias.astype(jnp.float32), 2), 3)
    adj_p = padk(padk(adj.astype(jnp.float32), 2), 3)
    imgt = img_tokens.astype(jnp.bfloat16)
    ipos = img_pos.astype(jnp.bfloat16)[None]

    at = params["self_attn"]
    ca = params["cross_attn"]
    w16 = lambda w: w.astype(jnp.bfloat16)  # noqa: E731
    vec = lambda v: v.reshape(1, -1)  # noqa: E731
    rep = lambda i: (0, 0)  # noqa: E731

    def wspec(shape):
        return pl.BlockSpec(shape, rep, memory_space=pltpu.VMEM)

    def vspec(n):
        return pl.BlockSpec((1, n), rep, memory_space=pltpu.VMEM)

    c2 = 2 * c
    # rows per program: amortize program setup and run the projections as
    # stacked matmuls; bounded by VMEM (img + bias blocks dominate)
    group = 1
    for g in (8, 6, 5, 4, 3, 2):
        need = (2 * g * (2 * k_pad * c * 2 + hw * c * 2
                         + num_heads * k_pad * k_pad * 4
                         + 2 * k_pad * k_pad * 4)
                + 2 * (2 * c2 * c2 + 4 * c * c + c * f2) * 2
                + g * k_pad * max(c2, f2) * 4)
        if b % g == 0 and need < 11 * 1024 * 1024:
            group = g
            break
    row = lambda *sh: pl.BlockSpec((group,) + sh,  # noqa: E731
                                   lambda i: (i,) + (0,) * len(sh),
                                   memory_space=pltpu.VMEM)
    args = [
        xt, qp, imgt, ipos, kb, bias_p, adj_p,
        w16(at["q_proj"]["kernel"]), vec(at["q_proj"]["bias"]),
        w16(at["k_proj"]["kernel"]), vec(at["k_proj"]["bias"]),
        w16(at["v_proj"]["kernel"]), vec(at["v_proj"]["bias"]),
        w16(at["out_proj"]["kernel"]), vec(at["out_proj"]["bias"]),
        vec(params["norm1"]["scale"]), vec(params["norm1"]["bias"]),
        w16(ca["q_proj"]["kernel"]), vec(ca["q_proj"]["bias"]),
        w16(ca["k_proj"]["kernel"]), vec(ca["k_proj"]["bias"]),
        w16(ca["v_proj"]["kernel"]), vec(ca["v_proj"]["bias"]),
        w16(ca["out_proj"]["kernel"]), vec(ca["out_proj"]["bias"]),
        w16(params["choker"]["kernel"]), vec(params["choker"]["bias"]),
        vec(params["norm2"]["scale"]), vec(params["norm2"]["bias"]),
        w16(params["gcn"]["conv"]["kernel"]),
        vec(params["gcn"]["conv"]["bias"]),
        w16(params["ffn2"]["kernel"]), vec(params["ffn2"]["bias"]),
        vec(params["norm3"]["scale"]), vec(params["norm3"]["bias"]),
    ]
    in_specs = [
        row(k_pad, c), row(k_pad, c), row(hw, c),
        pl.BlockSpec((1, hw, c), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        row(1, k_pad), row(num_heads, k_pad, k_pad), row(2, k_pad, k_pad),
        wspec((c, c)), vspec(c), wspec((c, c)), vspec(c),
        wspec((c, c)), vspec(c), wspec((c, c)), vspec(c),
        vspec(c), vspec(c),
        wspec((c2, c2)), vspec(c2), wspec((c2, c2)), vspec(c2),
        wspec((c, c2)), vspec(c2), wspec((c2, c2)), vspec(c2),
        wspec((c2, c)), vspec(c), vspec(c), vspec(c),
        wspec((c, f2)), vspec(f2), wspec((f2 // 2, c)), vspec(c),
        vspec(c), vspec(c),
    ]
    out = pl.pallas_call(
        functools.partial(_kernel, eps=eps, num_heads=num_heads),
        out_shape=jax.ShapeDtypeStruct((b, k_pad, c), x.dtype),
        grid=(b // group,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((group, k_pad, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*args)
    return out[:, :k, :]


# ---------------------------------------------------------------- stack

# A&S 7.1.26 polynomial erf (|err| <= 1.5e-7 — far below the bf16 noise
# of the surrounding matmuls; used instead of jax.lax.erf so the kernel
# does not depend on a Mosaic erf lowering).
_ERF_A = (0.254829592, -0.284496736, 1.421413741, -1.453152027,
          1.061405429)
_ERF_P = 0.3275911


def _erf(z):
    s = jnp.sign(z)
    az = jnp.abs(z)
    t = 1.0 / (1.0 + _ERF_P * az)
    a1, a2, a3, a4, a5 = _ERF_A
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-az * az))


def _gelu(x):
    """Exact (erf) GELU, matching flax nn.gelu(approximate=False)."""
    return 0.5 * x * (1.0 + _erf(x * 0.7071067811865476))




# refs per layer in the flat `rest` of _stack_kernel, in order:
# wqkv, bqkv, wso, bso, ln1s, ln1b, wcq, bcq, wck, bck, wcv, bcv,
# wco, bco, wch, bch, ln2s, ln2b, wg, bg, wf, bf, ln3s, ln3b,
# k0w, k0b, k1w, k1b, k2w, k2b, kow, kob   (kpt_branch)
_STACK_REFS = 32


def _stack_kernel(x_ref, ct_ref, img_ref, ipos_ref, kb_ref, hops_ref,
                  adj_ref, rdt_ref, fc1p_ref, rb1_ref, fc2_ref, rb2_ref,
                  fns_ref, fnb_ref, bm1_ref, bm1b_ref, bm2_ref, bm2b_ref,
                  *rest, eps: float, num_heads: int, num_layers: int,
                  has_bias: bool):
    refs = rest[:_STACK_REFS]
    outs_ref, pts_ref, xout_ref = rest[_STACK_REFS:]
    (wqkv_r, bqkv_r, wso_r, bso_r, ln1s_r, ln1b_r,
     wcq_r, bcq_r, wck_r, bck_r, wcv_r, bcv_r,
     wco_r, bco_r, wch_r, bch_r, ln2s_r, ln2b_r,
     wg_r, bg_r, wf_r, bf_r, ln3s_r, ln3b_r,
     k0w_r, k0b_r, k1w_r, k1b_r, k2w_r, k2b_r, kow_r, kob_r) = refs
    gsz, kp, c = x_ref.shape
    d = c // num_heads
    c2 = 2 * c
    d2 = c2 // num_heads
    nh = num_heads
    rdt = rdt_ref[0]                                        # [1? -> 128]
    ipos = ipos_ref[0].astype(jnp.bfloat16)                 # [HW, C]

    def layer_norm(xf, s_ref, b_ref, li=None):
        s = s_ref[li] if li is not None else s_ref[0]
        bb = b_ref[li] if li is not None else b_ref[0]
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean((xf - mean) ** 2, axis=-1, keepdims=True)
        h = (xf - mean) * jax.lax.rsqrt(var + eps)
        return h * s.astype(jnp.float32) + bb.astype(jnp.float32)

    def matmul(a, w, b=None):
        y = jax.lax.dot_general(a, w, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if b is not None:
            y = y + b.astype(jnp.float32)
        return y

    for g in range(gsz):
        x = x_ref[g]                                        # bf16 [Kp, C]
        ct = ct_ref[g][:, 0:2].astype(jnp.float32)          # [Kp, 2]
        kb = kb_ref[g]                                      # [1, Kp]
        imgall = img_ref[g].astype(jnp.bfloat16)            # [HW, C]
        kc = jnp.concatenate([imgall, ipos], axis=1)        # [HW, 2C]
        for li in range(num_layers):
            # ---- query positions from current coords (sine + MLP).
            # feats = [sin_y | cos_y | sin_x | cos_x], each full-width;
            # fc1p's rows are pre-permuted so this equals the chained
            # interleaved embedding @ fc1.
            ang_x = (ct[:, 0:1] * 6.283185307179586) * rdt  # [Kp, F]
            ang_y = (ct[:, 1:2] * 6.283185307179586) * rdt
            feats = jnp.concatenate(
                [jnp.sin(ang_y), jnp.cos(ang_y),
                 jnp.sin(ang_x), jnp.cos(ang_x)], axis=1).astype(
                jnp.bfloat16)                               # [Kp, 4F]
            h = _gelu(matmul(feats, fc1p_ref[:], rb1_ref[0]))
            qpos = matmul(h.astype(jnp.bfloat16), fc2_ref[:],
                          rb2_ref[0]).astype(jnp.bfloat16)  # [Kp, C]

            # ---- Markov structural bias from the hop-power stack
            heads_bias = None
            if has_bias:
                nhop = hops_ref.shape[1]
                hid = bm1_ref.shape[2]
                hb = [hops_ref[g, j].astype(jnp.float32)
                      for j in range(nhop)]                 # [Kp, Kp] x5
                hidden = []
                for m in range(hid):
                    acc = jnp.full((kp, kp), bm1b_ref[li, m],
                                   jnp.float32)
                    for j in range(nhop):
                        acc = acc + hb[j] * bm1_ref[li, j, m]
                    hidden.append(jnp.maximum(acc, 0.0))
                heads_bias = []
                for hi in range(nh):
                    acc = jnp.full((kp, kp), bm2b_ref[li, hi],
                                   jnp.float32)
                    for m in range(hid):
                        acc = acc + hidden[m] * bm2_ref[li, m, hi]
                    heads_bias.append(acc)

            # ---- (1) biased self-attention
            src = x                                         # bf16
            qkv = matmul(src, wqkv_r[li], bqkv_r[li]).astype(
                jnp.bfloat16)                               # [Kp, 3C]
            outs = []
            for hi in range(nh):
                sq = slice(hi * d, (hi + 1) * d)
                sk = slice(c + hi * d, c + (hi + 1) * d)
                sv = slice(2 * c + hi * d, 2 * c + (hi + 1) * d)
                s = jax.lax.dot_general(
                    qkv[:, sq], qkv[:, sk], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * (d ** -0.5)
                if has_bias:
                    s = s + heads_bias[hi]
                s = s + kb
                s = s - jnp.max(s, axis=-1, keepdims=True)
                e = jnp.exp(s)
                p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(
                    jnp.bfloat16)
                outs.append(jax.lax.dot_general(
                    p, qkv[:, sv], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(
                    jnp.bfloat16))
            att = matmul(jnp.concatenate(outs, axis=1), wso_r[li],
                         bso_r[li])
            x1 = layer_norm(src.astype(jnp.float32) + att, ln1s_r,
                            ln1b_r, li)

            # ---- (2) concat-position cross-attention + choker
            qc = jnp.concatenate([x1.astype(jnp.bfloat16), qpos], axis=1)
            q2 = matmul(qc, wcq_r[li], bcq_r[li]).astype(jnp.bfloat16)
            k2 = matmul(kc, wck_r[li], bck_r[li]).astype(jnp.bfloat16)
            v2 = matmul(imgall, wcv_r[li], bcv_r[li]).astype(
                jnp.bfloat16)                               # [HW, 2C]
            outs = []
            for hi in range(nh):
                sl = slice(hi * d2, (hi + 1) * d2)
                s = jax.lax.dot_general(
                    q2[:, sl], k2[:, sl], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * (d2 ** -0.5)
                s = s - jnp.max(s, axis=-1, keepdims=True)
                e = jnp.exp(s)
                p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(
                    jnp.bfloat16)
                outs.append(jax.lax.dot_general(
                    p, v2[:, sl], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(
                    jnp.bfloat16))
            att2 = matmul(jnp.concatenate(outs, axis=1), wco_r[li],
                          bco_r[li]).astype(jnp.bfloat16)   # [Kp, 2C]
            att2 = matmul(att2, wch_r[li], bch_r[li])       # -> C
            x2 = layer_norm(x1 + att2, ln2s_r, ln2b_r, li)

            # ---- (3) GCN feed-forward with the 2-slice adjacency
            y = matmul(x2.astype(jnp.bfloat16), wg_r[li],
                       bg_r[li])                            # [Kp, 2F]
            f_dim = y.shape[1] // 2
            y = y.astype(jnp.bfloat16)
            a0 = adj_ref[g, 0]                              # bf16
            a1 = adj_ref[g, 1]
            m = (jax.lax.dot_general(a0, y[:, :f_dim],
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
                 + jax.lax.dot_general(a1, y[:, f_dim:],
                                       (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32))
            f = jnp.maximum(m, 0.0).astype(jnp.bfloat16)
            f = matmul(f, wf_r[li], bf_r[li])
            x3 = layer_norm(x2 + f, ln3s_r, ln3b_r, li)
            x_bf = x3.astype(jnp.bfloat16)

            # ---- final norm + dual kpt_branch + coordinate update.
            # kin stacks [trajectory-input; recompute-input] rows so the
            # 4-matmul MLP runs once over 2*Kp rows.
            n_bf = layer_norm(x_bf.astype(jnp.float32), fns_ref,
                              fnb_ref).astype(jnp.bfloat16)
            kin = jnp.concatenate([x_bf, n_bf], axis=0)     # [2Kp, C]
            kh = _gelu(matmul(kin, k0w_r[li], k0b_r[li])).astype(
                jnp.bfloat16)
            kh = _gelu(matmul(kh, k1w_r[li], k1b_r[li])).astype(
                jnp.bfloat16)
            kh = _gelu(matmul(kh, k2w_r[li], k2b_r[li])).astype(
                jnp.bfloat16)
            dd = matmul(kh, kow_r[li], kob_r[li])           # [2Kp, 2pad]
            inv = _invsig(ct)                               # [Kp, 2]
            bi_new = jax.nn.sigmoid(inv + dd[:kp, 0:2])
            out_co = jax.nn.sigmoid(inv + dd[kp:, 0:2])
            pad = jnp.zeros((kp, pts_ref.shape[3] - 2), jnp.float32)
            pts_ref[g, li] = jnp.concatenate([bi_new, pad], axis=1)
            outs_ref[g, li] = jnp.concatenate([out_co, pad], axis=1)
            ct = bi_new
            x = x_bf
        xout_ref[g] = x


def _stack_chunk(x, ct, img_tokens, ipos, kb, hops, adj, shared, layers,
                 *, num_heads: int, eps: float, interpret: bool):
    """One VMEM-resident chunk of decoder layers. x [B, Kp, C] bf16;
    ct [B, Kp, 8] fp32 (lanes 0,1 = current x,y); returns
    (outs [B, Lc, Kp, 8], pts [B, Lc, Kp, 8], x_out [B, Kp, C])."""
    b, kp, c = x.shape
    hw = img_tokens.shape[1]
    lc = layers["wqkv"].shape[0]
    has_bias = hops is not None

    # honest VMEM need: chunk weights resident once; row blocks and
    # outputs double-buffered; ~2 MB/row-group headroom for Mosaic
    # temporaries (kc/q2/k2/v2 + fp32 matmul outputs + bias blocks)
    wbytes = sum(a.size * a.dtype.itemsize for a in layers.values())
    wbytes += sum(a.size * a.dtype.itemsize for a in shared.values())
    group = 1
    for g in (4, 2):
        rows = g * (kp * c * 2 + kp * 128 * 4 + hw * c * 2
                    + (5 * kp * kp * 2 if has_bias else 0)
                    + 2 * kp * kp * 2 + kp * 4)
        outs = g * (2 * lc * kp * 128 * 4 + kp * c * 2)
        need = wbytes + 2 * rows + 2 * outs + g * 2 * 1024 * 1024
        if b % g == 0 and need < 14 * 1024 * 1024:
            group = g
            break

    rep = lambda *nd: (lambda i: (0,) * len(nd))  # noqa: E731
    row = lambda *sh: pl.BlockSpec((group,) + sh,  # noqa: E731
                                   lambda i: (i,) + (0,) * len(sh),
                                   memory_space=pltpu.VMEM)
    full = lambda a: pl.BlockSpec(  # noqa: E731
        a.shape, rep(*a.shape), memory_space=pltpu.VMEM)
    smem = lambda a: pl.BlockSpec(  # noqa: E731
        a.shape, rep(*a.shape), memory_space=pltpu.SMEM)

    if has_bias:
        hops_arg = hops
        hop_spec = row(hops.shape[1], kp, kp)
    else:  # dummy 1-element block, never read (has_bias=False)
        hops_arg = jnp.zeros((b, 1, 8, 128), jnp.bfloat16)
        hop_spec = row(1, 8, 128)
    bm_args = [shared["bm1"], shared["bm1b"], shared["bm2"],
               shared["bm2b"]]

    order = ("wqkv", "bqkv", "wso", "bso", "ln1s", "ln1b",
             "wcq", "bcq", "wck", "bck", "wcv", "bcv",
             "wco", "bco", "wch", "bch", "ln2s", "ln2b",
             "wg", "bg", "wf", "bf", "ln3s", "ln3b",
             "k0w", "k0b", "k1w", "k1b", "k2w", "k2b", "kow", "kob")
    layer_args = [layers[k] for k in order]

    outs, pts, x_out = pl.pallas_call(
        functools.partial(_stack_kernel, eps=eps, num_heads=num_heads,
                          num_layers=lc, has_bias=has_bias),
        out_shape=(
            jax.ShapeDtypeStruct((b, lc, kp, 8), jnp.float32),
            jax.ShapeDtypeStruct((b, lc, kp, 8), jnp.float32),
            jax.ShapeDtypeStruct((b, kp, c), jnp.bfloat16),
        ),
        grid=(b // group,),
        in_specs=[
            row(kp, c), row(kp, 8), row(hw, c),
            pl.BlockSpec((1, hw, c), rep(0, 0, 0),
                         memory_space=pltpu.VMEM),
            row(1, kp), hop_spec, row(2, kp, kp),
            full(shared["rdt"]), full(shared["fc1p"]),
            full(shared["rb1"]), full(shared["fc2"]),
            full(shared["rb2"]), full(shared["fns"]),
            full(shared["fnb"]),
            smem(shared["bm1"]), smem(shared["bm1b"]),
            smem(shared["bm2"]), smem(shared["bm2b"]),
        ] + [full(a) for a in layer_args],
        out_specs=(
            pl.BlockSpec((group, lc, kp, 8), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, lc, kp, 8), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, kp, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(x, ct, img_tokens, ipos, kb, hops_arg, adj, shared["rdt"],
      shared["fc1p"], shared["rb1"], shared["fc2"], shared["rb2"],
      shared["fns"], shared["fnb"], *bm_args, *layer_args)
    return outs, pts, x_out


def _permute_fc1(fc1, num_feats):
    """Fold the sine/cos lane interleave into ref_point_head.fc1: row j
    of fc1 multiplies emb[j]; emb[2i] = sin(ang[2i]), emb[2i+1] =
    cos(ang[2i+1]) per axis (pos_enc._interleave_sin_cos). The kernel
    feeds [sin_y | cos_y | sin_x | cos_x] (each num_feats wide), so
    fc1p[j] = fc1[orig row] at the matching (axis, sin/cos, freq)."""
    f = num_feats
    c = fc1.shape[1]
    ev = jnp.arange(0, f, 2)
    od = jnp.arange(1, f, 2)
    fc1p = jnp.zeros((4 * f, c), fc1.dtype)
    fc1p = fc1p.at[ev].set(fc1[ev])                  # sin_y, even freqs
    fc1p = fc1p.at[f + od].set(fc1[od])              # cos_y, odd freqs
    fc1p = fc1p.at[2 * f + ev].set(fc1[f + ev])      # sin_x
    fc1p = fc1p.at[3 * f + od].set(fc1[f + od])      # cos_x
    return fc1p


@functools.partial(jax.jit, static_argnames=(
    "num_heads", "num_feats", "eps", "interpret", "max_chunk_bytes"))
def fused_decoder_stack(x, initial_coords, img_tokens, img_pos, kp_valid,
                        hop_stack, adj, layer_params, rph_params,
                        norm_params, *, num_heads: int, num_feats: int,
                        eps: float = 1e-5, interpret: bool = False,
                        max_chunk_bytes: int = 8 * 1024 * 1024):
    """Whole refinement decoder (layer chunks + all inter-layer glue) in
    Pallas. layer_params: tuple of per-layer dicts with keys
    'dec' (DecoderLayer param subtree), 'kpt' (KptBranch subtree), and
    optional 'bias_mlp'. Returns (outputs [L, B, K, 2] — the reference
    head-recompute predictions, points [L, B, K, 2] — the trajectory
    after each layer), both fp32.
    """
    b, k, c = x.shape
    hw = img_tokens.shape[1]
    num_layers = len(layer_params)
    k_pad = ((k + 127) // 128) * 128
    has_bias = (hop_stack is not None
                and layer_params[0].get("bias_mlp") is not None)

    def padk(a, axis):
        pad = [(0, 0)] * a.ndim
        pad[axis] = (0, k_pad - k)
        return jnp.pad(a, pad) if k_pad != k else a

    xt = padk(x.astype(jnp.bfloat16), 1)
    ct = jnp.pad(initial_coords.astype(jnp.float32),
                 [(0, 0), (0, k_pad - k), (0, 6)])          # [B, Kp, 8]
    kb = jnp.where(kp_valid, 0.0, -jnp.inf).astype(jnp.float32)
    kb = jnp.pad(kb, [(0, 0), (0, k_pad - k)], constant_values=-jnp.inf)
    kb = kb[:, None, :]
    imgt = img_tokens.astype(jnp.bfloat16)
    ipos = img_pos.astype(jnp.bfloat16)[None]
    adj_p = padk(padk(adj.astype(jnp.bfloat16), 2), 3)
    hops = None
    if has_bias:
        # [B, K, K, n_hop] -> [B, n_hop, Kp, Kp] (bias on padded slots is
        # mlp(0) != 0, but padded keys are -inf-masked and padded query
        # rows are never read)
        hops = padk(padk(
            hop_stack.astype(jnp.bfloat16).transpose(0, 3, 1, 2), 2), 3)

    w16 = lambda w: w.astype(jnp.bfloat16)  # noqa: E731

    def stack(fn):
        return jnp.stack([fn(lp) for lp in chunk_params], axis=0)

    rph_f = rph_params["fc1"]["kernel"].astype(jnp.float32)
    shared = dict(
        rdt=(1.0 / jnp.asarray(
            [10000.0 ** (2.0 * (i // 2) / num_feats)
             for i in range(num_feats)], jnp.float32))[None, :],
        fc1p=w16(_permute_fc1(rph_f, num_feats)),
        rb1=rph_params["fc1"]["bias"].astype(jnp.float32)[None, :],
        fc2=w16(rph_params["fc2"]["kernel"]),
        rb2=rph_params["fc2"]["bias"].astype(jnp.float32)[None, :],
        fns=norm_params["scale"].astype(jnp.float32)[None, :],
        fnb=norm_params["bias"].astype(jnp.float32)[None, :],
    )

    # partition layers into VMEM-resident chunks
    per_layer_bytes = 0
    lp0 = layer_params[0]["dec"]
    for sub in ("self_attn", "cross_attn"):
        for pp in lp0[sub].values():
            per_layer_bytes += pp["kernel"].size * 2
    per_layer_bytes += (lp0["choker"]["kernel"].size
                        + lp0["gcn"]["conv"]["kernel"].size
                        + lp0["ffn2"]["kernel"].size) * 2
    kp0 = layer_params[0]["kpt"]
    per_layer_bytes += sum(kp0[n]["kernel"].size * 2
                           for n in ("fc0", "fc1", "fc2")) + c * 128 * 2
    chunk_len = max(1, min(num_layers,
                           max_chunk_bytes // max(per_layer_bytes, 1)))

    outs_all, pts_all = [], []
    li = 0
    while li < num_layers:
        lc = min(chunk_len, num_layers - li)
        chunk_params = layer_params[li:li + lc]
        layers = dict(
            wqkv=stack(lambda lp: w16(jnp.concatenate(
                [lp["dec"]["self_attn"][f"{n}_proj"]["kernel"]
                 for n in ("q", "k", "v")], axis=1))),
            bqkv=stack(lambda lp: jnp.concatenate(
                [lp["dec"]["self_attn"][f"{n}_proj"]["bias"]
                 for n in ("q", "k", "v")])[None, :]),
            wso=stack(lambda lp: w16(
                lp["dec"]["self_attn"]["out_proj"]["kernel"])),
            bso=stack(lambda lp:
                      lp["dec"]["self_attn"]["out_proj"]["bias"][None, :]),
            ln1s=stack(lambda lp: lp["dec"]["norm1"]["scale"][None, :]),
            ln1b=stack(lambda lp: lp["dec"]["norm1"]["bias"][None, :]),
            wcq=stack(lambda lp: w16(
                lp["dec"]["cross_attn"]["q_proj"]["kernel"])),
            bcq=stack(lambda lp:
                      lp["dec"]["cross_attn"]["q_proj"]["bias"][None, :]),
            wck=stack(lambda lp: w16(
                lp["dec"]["cross_attn"]["k_proj"]["kernel"])),
            bck=stack(lambda lp:
                      lp["dec"]["cross_attn"]["k_proj"]["bias"][None, :]),
            wcv=stack(lambda lp: w16(
                lp["dec"]["cross_attn"]["v_proj"]["kernel"])),
            bcv=stack(lambda lp:
                      lp["dec"]["cross_attn"]["v_proj"]["bias"][None, :]),
            wco=stack(lambda lp: w16(
                lp["dec"]["cross_attn"]["out_proj"]["kernel"])),
            bco=stack(lambda lp:
                      lp["dec"]["cross_attn"]["out_proj"]["bias"][None, :]),
            wch=stack(lambda lp: w16(lp["dec"]["choker"]["kernel"])),
            bch=stack(lambda lp: lp["dec"]["choker"]["bias"][None, :]),
            ln2s=stack(lambda lp: lp["dec"]["norm2"]["scale"][None, :]),
            ln2b=stack(lambda lp: lp["dec"]["norm2"]["bias"][None, :]),
            wg=stack(lambda lp: w16(lp["dec"]["gcn"]["conv"]["kernel"])),
            bg=stack(lambda lp: lp["dec"]["gcn"]["conv"]["bias"][None, :]),
            wf=stack(lambda lp: w16(lp["dec"]["ffn2"]["kernel"])),
            bf=stack(lambda lp: lp["dec"]["ffn2"]["bias"][None, :]),
            ln3s=stack(lambda lp: lp["dec"]["norm3"]["scale"][None, :]),
            ln3b=stack(lambda lp: lp["dec"]["norm3"]["bias"][None, :]),
            k0w=stack(lambda lp: w16(lp["kpt"]["fc0"]["kernel"])),
            k0b=stack(lambda lp: lp["kpt"]["fc0"]["bias"][None, :]),
            k1w=stack(lambda lp: w16(lp["kpt"]["fc1"]["kernel"])),
            k1b=stack(lambda lp: lp["kpt"]["fc1"]["bias"][None, :]),
            k2w=stack(lambda lp: w16(lp["kpt"]["fc2"]["kernel"])),
            k2b=stack(lambda lp: lp["kpt"]["fc2"]["bias"][None, :]),
            kow=stack(lambda lp: w16(jnp.pad(
                lp["kpt"]["out"]["kernel"], [(0, 0), (0, 126)]))),
            kob=stack(lambda lp: jnp.pad(
                lp["kpt"]["out"]["bias"], (0, 126))[None, :]),
        )
        if has_bias:
            shared_c = dict(
                shared,
                bm1=stack(lambda lp: lp["bias_mlp"]["fc1"]["kernel"]
                          .astype(jnp.float32)),
                bm1b=stack(lambda lp: lp["bias_mlp"]["fc1"]["bias"]
                           .astype(jnp.float32)),
                bm2=stack(lambda lp: lp["bias_mlp"]["fc2"]["kernel"]
                          .astype(jnp.float32)),
                bm2b=stack(lambda lp: lp["bias_mlp"]["fc2"]["bias"]
                           .astype(jnp.float32)),
            )
        else:
            shared_c = dict(
                shared,
                bm1=jnp.zeros((lc, 1, 1), jnp.float32),
                bm1b=jnp.zeros((lc, 1), jnp.float32),
                bm2=jnp.zeros((lc, 1, 1), jnp.float32),
                bm2b=jnp.zeros((lc, 1), jnp.float32),
            )
        outs, pts, xt = _stack_chunk(
            xt, ct, imgt, ipos, kb, hops, adj_p, shared_c, layers,
            num_heads=num_heads, eps=eps, interpret=interpret)
        ct = pts[:, -1]                          # [B, Kp, 8] chunk carry
        outs_all.append(outs)
        pts_all.append(pts)
        li += lc

    outs = jnp.concatenate(outs_all, axis=1)                # [B, L, Kp, 8]
    pts = jnp.concatenate(pts_all, axis=1)
    outputs = outs[:, :, :k, 0:2].transpose(1, 0, 2, 3)     # [L, B, K, 2]
    points = pts[:, :, :k, 0:2].transpose(1, 0, 2, 3)
    return outputs, points
