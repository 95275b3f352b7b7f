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
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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
