"""Whole ViT block in ONE Pallas kernel (TPU).

Round-2 fused the two block halves separately (ops/fused_attn_block.py:
LN+MHA+proj+LayerScale residual; ops/fused_mlp.py: LN+MLP+LayerScale
residual). Measured back-to-back they still cost a full activation
round-trip between them — x ([512, 264, 384] bf16 = 104MB at eval batch)
is written by the attention kernel and immediately re-read by the MLP
kernel, plus a second grid's program overhead. This kernel keeps the
token block resident in VMEM across BOTH halves: one read of x, one write
of the block output, weights resident (all ~3.5MB bf16 of them).

Numerics identical to the two-kernel composition: bf16 matmuls with fp32
accumulation, fp32 LayerNorm statistics, tanh-approximate gelu (see
fused_mlp.py for the erf note).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _block_body(x, refs, *, eps: float, num_heads: int, n_real: int,
                scale: float):
    """One pre-norm ViT block on an fp32 token block x [Np, C]; refs is
    the 19-tuple of this block's weight refs (same order as
    fused_vit_block's weight args). Returns the fp32 block output."""
    (ln1s_ref, ln1b_ref, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
     wp_ref, bp_ref, ls1_ref, ln2s_ref, ln2b_ref, w1_ref, b1_ref, w2_ref,
     b2_ref, ls2_ref) = refs
    n_pad = x.shape[0]
    d = x.shape[1] // num_heads

    def layer_norm(xf, s_ref, b_ref):
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean((xf - mean) ** 2, axis=-1, keepdims=True)
        h = (xf - mean) * jax.lax.rsqrt(var + eps)
        return (h * s_ref[0].astype(jnp.float32)
                + b_ref[0].astype(jnp.float32)).astype(jnp.bfloat16)

    h = layer_norm(x, ln1s_ref, ln1b_ref)

    def proj(w_ref, b_ref):
        y = jax.lax.dot_general(
            h, w_ref[:], (((1,), (0,)), ((), ())),
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
            preferred_element_type=jnp.float32) * scale   # [Np, Np]
        if n_real < n_pad:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < n_real, s, -jnp.inf)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(
            jnp.bfloat16)
        outs.append(jax.lax.dot_general(
            p, v[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16))
    att = jnp.concatenate(outs, axis=1)                   # [Np, C]
    o = jax.lax.dot_general(
        att, wp_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o = o + bp_ref[0].astype(jnp.float32)
    x1 = x + ls1_ref[0].astype(jnp.float32) * o           # fp32 residual

    h2 = layer_norm(x1, ln2s_ref, ln2b_ref)
    f = jax.lax.dot_general(
        h2, w1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    f = f + b1_ref[0].astype(jnp.float32)
    f = 0.5 * f * (1.0 + jnp.tanh(
        0.7978845608028654 * (f + 0.044715 * f ** 3)))
    f = f.astype(jnp.bfloat16)
    g2 = jax.lax.dot_general(
        f, w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    g2 = g2 + b2_ref[0].astype(jnp.float32)
    return x1 + ls2_ref[0].astype(jnp.float32) * g2


def _kernel(x_ref, *rest, eps: float, num_heads: int, n_real: int,
            scale: float):
    refs, o_ref = rest[:-1], rest[-1]
    for g in range(x_ref.shape[0]):
        x = x_ref[g].astype(jnp.float32)                  # [Np, C]
        y = _block_body(x, refs, eps=eps, num_heads=num_heads,
                        n_real=n_real, scale=scale)
        o_ref[g] = y.astype(o_ref.dtype)


def _kernel2(x_ref, *rest, eps: float, num_heads: int, n_real: int,
             scale: float):
    """TWO consecutive blocks per program: the token block stays resident
    in VMEM across both (halves program count and the HBM activation
    round-trip vs. two single-block calls)."""
    refs, o_ref = rest[:-1], rest[-1]
    refs_a, refs_b = refs[:18], refs[18:]
    for g in range(x_ref.shape[0]):
        x = x_ref[g].astype(jnp.float32)
        x = _block_body(x, refs_a, eps=eps, num_heads=num_heads,
                        n_real=n_real, scale=scale)
        # round to bf16 between the blocks exactly like the two-call
        # composition does at its HBM boundary -> bit-identical output
        x = x.astype(jnp.bfloat16).astype(jnp.float32)
        y = _block_body(x, refs_b, eps=eps, num_heads=num_heads,
                        n_real=n_real, scale=scale)
        o_ref[g] = y.astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("num_heads", "eps", "interpret"))
def fused_vit_block(x, ln1_scale, ln1_bias, wq, bq, wk, bk, wv, bv, wproj,
                    bproj, ls1, ln2_scale, ln2_bias, w1, b1, w2, b2, ls2,
                    *, num_heads: int, eps: float = 1e-6,
                    interpret: bool = False):
    """Full pre-norm ViT block with LayerScale:
    x1 = x + ls1 * proj(MHA(LN1(x))); y = x1 + ls2 * MLP(LN2(x1)).
    x: [B, N, C]."""
    b, n, c = x.shape
    d = c // num_heads
    f_dim = w1.shape[1]
    # sublane-only row padding (257 -> 264): measured 10% faster than
    # 128-lane padding on the backbone (docs/performance.md round 2)
    n_pad = ((n + 7) // 8) * 8
    xt = x.astype(jnp.bfloat16)
    if n_pad != n:
        xt = jnp.pad(xt, [(0, 0), (0, n_pad - n), (0, 0)])

    group = 1
    for g in (8, 4, 2):
        need = (2 * 2 * g * n_pad * c * 2            # x/out double-buffer
                + 4 * c * c * 2 + 2 * c * f_dim * 2  # weights resident
                + 2 * n_pad * n_pad * 4              # score scratch
                + 2 * n_pad * f_dim * 2)             # mlp intermediate
        if b % g == 0 and need < 11 * 1024 * 1024:
            group = g
            break

    vec = lambda v: v.reshape(1, -1)  # noqa: E731
    rep = lambda i: (0, 0)  # noqa: E731
    wspec = pl.BlockSpec((c, c), rep, memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((1, c), rep, memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, eps=eps, num_heads=num_heads, n_real=n,
                          scale=1.0 / (d ** 0.5)),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, c), x.dtype),
        grid=(b // group,),
        in_specs=[
            pl.BlockSpec((group, n_pad, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            vspec, vspec,                              # ln1
            wspec, vspec, wspec, vspec, wspec, vspec,  # q k v
            wspec, vspec, vspec,                       # proj, ls1
            vspec, vspec,                              # ln2
            pl.BlockSpec((c, f_dim), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f_dim), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((f_dim, c), rep, memory_space=pltpu.VMEM),
            vspec, vspec,                              # b2, ls2
        ],
        out_specs=pl.BlockSpec((group, n_pad, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xt, vec(ln1_scale), vec(ln1_bias),
      wq.astype(jnp.bfloat16), vec(bq), wk.astype(jnp.bfloat16), vec(bk),
      wv.astype(jnp.bfloat16), vec(bv), wproj.astype(jnp.bfloat16),
      vec(bproj), vec(ls1), vec(ln2_scale), vec(ln2_bias),
      w1.astype(jnp.bfloat16), vec(b1), w2.astype(jnp.bfloat16), vec(b2),
      vec(ls2))
    return out[:, :n, :]


@functools.partial(jax.jit,
                   static_argnames=("num_heads", "eps", "interpret"))
def fused_vit_block2(x, block_a, block_b, *, num_heads: int,
                     eps: float = 1e-6, interpret: bool = False):
    """TWO consecutive pre-norm ViT blocks in ONE Pallas kernel.

    block_a/block_b: 18-tuples in fused_vit_block's weight order
    (ln1_scale, ln1_bias, wq, bq, wk, bk, wv, bv, wproj, bproj, ls1,
    ln2_scale, ln2_bias, w1, b1, w2, b2, ls2). Halves the program count
    and the inter-block HBM activation round-trip vs. two single-block
    calls; the intermediate is rounded to bf16 in-register so the output
    is bit-identical to the composition. Motivated by the round-3
    roofline (backbone stage 63.8ms vs ~34ms ideal: serial MXU-burst
    chains per program were the stated bound — this doubles the chain
    length per program)."""
    b, n, c = x.shape
    d = c // num_heads
    f_dim = block_a[13].shape[1]
    n_pad = ((n + 7) // 8) * 8
    xt = x.astype(jnp.bfloat16)
    if n_pad != n:
        xt = jnp.pad(xt, [(0, 0), (0, n_pad - n), (0, 0)])

    group = 1
    for g in (8, 4, 2):
        need = (2 * 2 * g * n_pad * c * 2             # x/out double-buffer
                + 2 * (4 * c * c * 2 + 2 * c * f_dim * 2)  # 2 blocks' W
                + 2 * n_pad * n_pad * 4               # score scratch
                + 2 * n_pad * f_dim * 2)              # mlp intermediate
        if b % g == 0 and need < 11 * 1024 * 1024:
            group = g
            break

    vec = lambda v: v.reshape(1, -1)  # noqa: E731
    rep = lambda i: (0, 0)  # noqa: E731
    wspec = pl.BlockSpec((c, c), rep, memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((1, c), rep, memory_space=pltpu.VMEM)

    def block_specs():
        return [
            vspec, vspec,                              # ln1
            wspec, vspec, wspec, vspec, wspec, vspec,  # q k v
            wspec, vspec, vspec,                       # proj, ls1
            vspec, vspec,                              # ln2
            pl.BlockSpec((c, f_dim), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f_dim), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((f_dim, c), rep, memory_space=pltpu.VMEM),
            vspec, vspec,                              # b2, ls2
        ]

    def block_args(blk):
        (ln1s, ln1b, wq, bq, wk, bk, wv, bv, wp, bp, ls1,
         ln2s, ln2b, w1, b1, w2, b2, ls2) = blk
        return (vec(ln1s), vec(ln1b),
                wq.astype(jnp.bfloat16), vec(bq),
                wk.astype(jnp.bfloat16), vec(bk),
                wv.astype(jnp.bfloat16), vec(bv),
                wp.astype(jnp.bfloat16), vec(bp), vec(ls1),
                vec(ln2s), vec(ln2b),
                w1.astype(jnp.bfloat16), vec(b1),
                w2.astype(jnp.bfloat16), vec(b2), vec(ls2))

    out = pl.pallas_call(
        functools.partial(_kernel2, eps=eps, num_heads=num_heads,
                          n_real=n, scale=1.0 / (d ** 0.5)),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, c), x.dtype),
        grid=(b // group,),
        in_specs=([pl.BlockSpec((group, n_pad, c), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)]
                  + block_specs() + block_specs()),
        out_specs=pl.BlockSpec((group, n_pad, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xt, *block_args(block_a), *block_args(block_b))
    return out[:, :n, :]


def reference_vit_block(x, ln1_scale, ln1_bias, wq, bq, wk, bk, wv, bv,
                        wproj, bproj, ls1, ln2_scale, ln2_bias, w1, b1,
                        w2, b2, ls2, *, num_heads: int, eps: float = 1e-6):
    """Composition of the two half-block references (identical
    semantics)."""
    from .fused_attn_block import reference_attn_block
    from .fused_mlp import reference_ln_mlp
    x1 = reference_attn_block(x, ln1_scale, ln1_bias, wq, bq, wk, bk, wv,
                              bv, wproj, bproj, ls1, num_heads=num_heads,
                              eps=eps)
    return reference_ln_mlp(x1, ln2_scale, ln2_bias, w1, b1, w2, b2, ls2,
                            eps=eps)
