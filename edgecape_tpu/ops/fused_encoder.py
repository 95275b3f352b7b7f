"""Fully-fused joint-encoder layer (Pallas, TPU).

One kernel per EncoderLayer (models/transformer.py:124-147 — the
reference TransformerEncoderLayer, encoder_decoder.py:434-483): position
added into q, k AND v via src = tokens + pos, masked multi-head
self-attention, post-norm residual, ReLU FFN, second post-norm. The XLA
form of this layer is fusion-bound (~16ms/layer at batch 510 over 356
tokens while its matmul roofline is ~2ms): qkv intermediates, per-head
transposes, fp32 score tensors and four elementwise/norm passes all
round-trip HBM. Here the whole layer — scores included — stays in VMEM.

`fused_encoder_stack` goes one step further (round 4): ALL encoder
layers in ONE program, the token block resident in VMEM across the
stack. Bit-identical to the chained single-layer calls — the
inter-layer value rounds to bf16 in-register exactly where the chain's
HBM boundary rounds it (the next call's `tokens.astype(bfloat16)`).
Targets the round-3 roofline gap (encoder stage 14 ms vs ~5 ms ideal,
attributed to serial MXU-burst/VPU-pass chains per program).

Eval-path kernels (no dropout); bf16 matmuls with fp32 accumulation and
fp32 LayerNorm statistics, tolerance-tested against the flax layer.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# refs per layer consumed by _layer_body, in fused_encoder_layer's
# weight-argument order
_REFS_PER_LAYER = 16


def _layer_body(src, kb, refs, *, eps: float, num_heads: int,
                scale: float):
    """One post-norm encoder layer on a bf16 token block src [Np, C]
    (position already added); kb is this row-group's [1, Np] key-mask
    bias. Returns the fp32 LN2 output."""
    (wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref, wo_ref, bo_ref,
     ln1s_ref, ln1b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
     ln2s_ref, ln2b_ref) = refs
    d = src.shape[1] // num_heads

    def proj(w_ref, b_ref):
        y = jax.lax.dot_general(
            src, w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return (y + b_ref[0].astype(jnp.float32)).astype(jnp.bfloat16)

    q = proj(wq_ref, bq_ref)
    k = proj(wk_ref, bk_ref)
    v = proj(wv_ref, bv_ref)

    outs = []
    for hi in range(num_heads):
        sl = slice(hi * d, (hi + 1) * d)
        s = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale      # [Np, Np]
        s = s + kb
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(
            jnp.bfloat16)
        outs.append(jax.lax.dot_general(
            p, v[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16))
    att = jnp.concatenate(outs, axis=1)                      # [Np, C]
    att = jax.lax.dot_general(
        att, wo_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bo_ref[0].astype(
        jnp.float32)

    def layer_norm(xf, s_ref, b_ref):
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean((xf - mean) ** 2, axis=-1, keepdims=True)
        h = (xf - mean) * jax.lax.rsqrt(var + eps)
        return h * s_ref[0].astype(jnp.float32) + b_ref[0].astype(
            jnp.float32)

    x = layer_norm(src.astype(jnp.float32) + att, ln1s_ref, ln1b_ref)
    xh = x.astype(jnp.bfloat16)
    f = jax.lax.dot_general(
        xh, w1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b1_ref[0].astype(
        jnp.float32)
    f = jnp.maximum(f, 0.0).astype(jnp.bfloat16)             # [Np, F]
    f2 = jax.lax.dot_general(
        f, w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b2_ref[0].astype(
        jnp.float32)
    return layer_norm(x + f2, ln2s_ref, ln2b_ref)


def _kernel(tok_ref, pos_ref, kb_ref, *rest, eps: float, num_heads: int,
            scale: float, num_layers: int):
    """num_layers encoder layers back-to-back; the token block never
    leaves VMEM. Inter-layer values round to bf16 exactly like the
    chained single-layer calls' HBM boundary (next call's
    tokens.astype(bfloat16)), so the stacked output is bit-identical."""
    refs, o_ref = rest[:-1], rest[-1]
    pos = pos_ref[0]
    for g in range(tok_ref.shape[0]):
        x = tok_ref[g]                                       # bf16 [Np, C]
        kb = kb_ref[g]                                       # [1, Np]
        for li in range(num_layers):
            lrefs = refs[li * _REFS_PER_LAYER:(li + 1) * _REFS_PER_LAYER]
            src = (x + pos).astype(jnp.bfloat16)
            y = _layer_body(src, kb, lrefs, eps=eps,
                            num_heads=num_heads, scale=scale)
            if li + 1 < num_layers:
                x = y.astype(jnp.bfloat16)
        o_ref[g] = y.astype(o_ref.dtype)


def _specs_and_args(layers, c, f_dim):
    """(in_specs, args) for a flat sequence of per-layer weight refs."""
    vec = lambda v: v.reshape(1, -1)  # noqa: E731
    rep = lambda i: (0, 0)  # noqa: E731
    wspec = pl.BlockSpec((c, c), rep, memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((1, c), rep, memory_space=pltpu.VMEM)
    specs, args = [], []
    for (wq, bq, wk, bk, wv, bv, wo, bo, ln1s, ln1b,
         w1, b1, w2, b2, ln2s, ln2b) in layers:
        specs += [wspec, vspec, wspec, vspec, wspec, vspec, wspec, vspec,
                  vspec, vspec,
                  pl.BlockSpec((c, f_dim), rep, memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, f_dim), rep, memory_space=pltpu.VMEM),
                  pl.BlockSpec((f_dim, c), rep, memory_space=pltpu.VMEM),
                  vspec, vspec, vspec]
        args += [wq.astype(jnp.bfloat16), vec(bq),
                 wk.astype(jnp.bfloat16), vec(bk),
                 wv.astype(jnp.bfloat16), vec(bv),
                 wo.astype(jnp.bfloat16), vec(bo),
                 vec(ln1s), vec(ln1b),
                 w1.astype(jnp.bfloat16), vec(b1),
                 w2.astype(jnp.bfloat16), vec(b2),
                 vec(ln2s), vec(ln2b)]
    return specs, args


def _run(tokens, pos, key_valid, layers, *, num_heads: int, eps: float,
         interpret: bool):
    b, n, c = tokens.shape
    f_dim = layers[0][10].shape[1]
    d = c // num_heads
    num_layers = len(layers)
    # 128-lane alignment measures faster here than sublane-only padding
    # (356 -> 384): the [Np, Np] score block is lane-tiled on Np
    n_pad = ((n + 127) // 128) * 128
    xt = tokens.astype(jnp.bfloat16)
    post = pos.astype(jnp.bfloat16)[None]                   # [1, N, C]
    if n_pad != n:
        xt = jnp.pad(xt, [(0, 0), (0, n_pad - n), (0, 0)])
        post = jnp.pad(post, [(0, 0), (0, n_pad - n), (0, 0)])
    kb = jnp.where(key_valid, 0.0, -jnp.inf).astype(jnp.float32)
    kb = jnp.pad(kb, [(0, 0), (0, n_pad - n)], constant_values=-jnp.inf)
    kb = kb[:, None, :]                                     # [B, 1, Np]

    # Row-group selection against the 16MB scoped-vmem limit. The
    # estimate must count the f32 OUT block (4B, not 2B) and the
    # kernel-internal scratch (q/k/v, fp32 score+exp blocks, FFN
    # intermediates): at B=512/group=8 the old 2-term estimate said
    # 9.0M while the compiler measured 16.81M and refused to compile.
    out_bytes = jnp.dtype(tokens.dtype).itemsize
    scratch = (3 * n_pad * c * 2             # q, k, v (bf16)
               + 2 * n_pad * n_pad * 4       # score + exp (fp32)
               + n_pad * n_pad * 2           # softmax probs (bf16)
               + 2 * n_pad * c * 4           # att out + LN1 out (fp32)
               + 2 * n_pad * f_dim * 4)      # FFN hidden (fp32 + relu)
    weights = num_layers * (4 * c * c * 2 + 2 * c * f_dim * 2
                            + 8 * max(c, f_dim) * 4)
    group = 1
    for g in (8, 4, 2):
        need = (2 * g * n_pad * c * 2        # tokens in, double-buffered
                + 2 * g * n_pad * c * out_bytes   # out, double-buffered
                + weights + scratch)
        if b % g == 0 and need < 12 * 1024 * 1024:
            group = g
            break

    rep3 = lambda i: (0, 0, 0)  # noqa: E731
    wspecs, wargs = _specs_and_args(layers, c, f_dim)
    out = pl.pallas_call(
        functools.partial(_kernel, eps=eps, num_heads=num_heads,
                          scale=1.0 / (d ** 0.5), num_layers=num_layers),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, c), tokens.dtype),
        grid=(b // group,),
        in_specs=[
            pl.BlockSpec((group, n_pad, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, c), rep3, memory_space=pltpu.VMEM),
            pl.BlockSpec((group, 1, n_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + wspecs,
        out_specs=pl.BlockSpec((group, n_pad, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xt, post, kb, *wargs)
    return out[:, :n, :]


@functools.partial(jax.jit,
                   static_argnames=("num_heads", "eps", "interpret"))
def fused_encoder_layer(tokens, pos, key_valid, wq, bq, wk, bk, wv, bv,
                        wo, bo, ln1_scale, ln1_bias, w1, b1, w2, b2,
                        ln2_scale, ln2_bias, *, num_heads: int,
                        eps: float = 1e-5, interpret: bool = False):
    """Post-norm encoder layer, position into q/k/v and the residual.

    tokens: [B, N, C]; pos: [N, C] (shared across the batch — image grid
    positions + zero keypoint slots); key_valid: [B, N] bool. Returns
    [B, N, C] in tokens.dtype.
    """
    layer = (wq, bq, wk, bk, wv, bv, wo, bo, ln1_scale, ln1_bias,
             w1, b1, w2, b2, ln2_scale, ln2_bias)
    return _run(tokens, pos, key_valid, (layer,), num_heads=num_heads,
                eps=eps, interpret=interpret)


@functools.partial(jax.jit,
                   static_argnames=("num_heads", "eps", "interpret"))
def fused_encoder_stack(tokens, pos, key_valid, layers, *,
                        num_heads: int, eps: float = 1e-5,
                        interpret: bool = False):
    """The WHOLE encoder (tuple of per-layer 16-tuples in
    fused_encoder_layer's weight order) in one Pallas program —
    bit-identical to chaining fused_encoder_layer per layer (see
    _kernel docstring)."""
    return _run(tokens, pos, key_valid, tuple(layers),
                num_heads=num_heads, eps=eps, interpret=interpret)


def reference_encoder_layer(tokens, pos, key_valid, wq, bq, wk, bk, wv,
                            bv, wo, bo, ln1_scale, ln1_bias, w1, b1, w2,
                            b2, ln2_scale, ln2_bias, *, num_heads: int,
                            eps: float = 1e-5):
    """Pure-jnp twin with identical semantics (matches
    transformer.EncoderLayer in eval mode)."""
    b, n, c = tokens.shape
    d = c // num_heads
    src = tokens + pos[None]
    q = (src @ wq + bq).reshape(b, n, num_heads, d)
    k = (src @ wk + bk).reshape(b, n, num_heads, d)
    v = (src @ wv + bv).reshape(b, n, num_heads, d)
    s = jnp.einsum("bqhd,bkhd->bhqk", q * (d ** -0.5), k,
                   preferred_element_type=jnp.float32)
    s = jnp.where(key_valid[:, None, None, :], s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1).astype(src.dtype)
    att = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(b, n, c)
    att = att @ wo + bo

    def ln(x, scale, bias):
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean((xf - mean) ** 2, axis=-1, keepdims=True)
        return ((xf - mean) * jax.lax.rsqrt(var + eps) * scale
                + bias).astype(x.dtype)

    x = ln(src + att, ln1_scale, ln1_bias)
    f = jnp.maximum(x @ w1 + b1, 0.0)
    return ln(x + f @ w2 + b2, ln2_scale, ln2_bias)
