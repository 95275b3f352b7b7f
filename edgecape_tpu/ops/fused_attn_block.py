"""Fused LayerNorm + multi-head self-attention + projection + LayerScale
residual (Pallas, TPU) — the full attention half of a ViT block in one
kernel.

Eliminates, per layer: the LN round trip, the [N, 3C] qkv intermediate in
HBM, the [B, N, H, D] <-> [B*H, N, D] transposes around a standalone
attention kernel, and the projection/residual elementwise passes. Q/K/V
projections are passed as separate [C, C] matrices (pre-split at trace
time) so per-head work uses static 64-lane slices instead of slicing a
fused 3C output.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, lns_ref, lnb_ref, wq_ref, bq_ref, wk_ref, bk_ref,
            wv_ref, bv_ref, wp_ref, bp_ref, ls_ref, o_ref, *,
            eps: float, num_heads: int, n_real: int, scale: float):
    n_pad = x_ref.shape[1]
    d = x_ref.shape[2] // num_heads
    for g in range(x_ref.shape[0]):
        x = x_ref[g].astype(jnp.float32)                  # [Np, C]
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
        h = (x - mean) * jax.lax.rsqrt(var + eps)
        h = (h * lns_ref[0].astype(jnp.float32)
             + lnb_ref[0].astype(jnp.float32)).astype(jnp.bfloat16)

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
                preferred_element_type=jnp.float32) * scale  # [Np, Np]
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
        att = jnp.concatenate(outs, axis=1)               # [Np, C]
        o = jax.lax.dot_general(
            att, wp_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o = o + bp_ref[0].astype(jnp.float32)
        o_ref[g] = (x + ls_ref[0].astype(jnp.float32) * o).astype(
            o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("num_heads", "eps", "interpret"))
def fused_attn_block(x, ln_scale, ln_bias, wq, bq, wk, bk, wv, bv, wproj,
                     bproj, layerscale, *, num_heads: int,
                     eps: float = 1e-6, interpret: bool = False):
    """y = x + layerscale * proj(MHA(LN(x))). x: [B, N, C]."""
    b, n, c = x.shape
    d = c // num_heads
    # rows only need sublane (8) alignment: 257 ViT tokens pad to 264,
    # not 384 — 31% fewer rows through every matmul; Mosaic masks the
    # partial lane tile of the [Np, Np] score block
    n_pad = ((n + 7) // 8) * 8
    xt = x.astype(jnp.bfloat16)
    if n_pad != n:
        xt = jnp.pad(xt, [(0, 0), (0, n_pad - n), (0, 0)])

    group = 1
    for g in (8, 4, 2):
        # blocks (x, o) + weights + per-head score scratch
        need = (2 * 2 * g * n_pad * c * 2 + 4 * c * c * 2
                + 2 * n_pad * n_pad * 4)
        if b % g == 0 and need < 10 * 1024 * 1024:
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
            vspec, vspec, wspec, vspec, wspec, vspec, wspec, vspec,
            wspec, vspec, vspec,
        ],
        out_specs=pl.BlockSpec((group, n_pad, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xt, vec(ln_scale), vec(ln_bias),
      wq.astype(jnp.bfloat16), vec(bq), wk.astype(jnp.bfloat16), vec(bk),
      wv.astype(jnp.bfloat16), vec(bv), wproj.astype(jnp.bfloat16),
      vec(bproj), vec(layerscale))
    return out[:, :n, :]


def reference_attn_block(x, ln_scale, ln_bias, wq, bq, wk, bk, wv, bv,
                         wproj, bproj, layerscale, *, num_heads: int,
                         eps: float = 1e-6):
    """Pure-jnp reference with identical semantics."""
    b, n, c = x.shape
    d = c // num_heads
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mean) ** 2, axis=-1, keepdims=True)
    h = (xf - mean) * jax.lax.rsqrt(var + eps) * ln_scale + ln_bias
    q = (h @ wq + bq).reshape(b, n, num_heads, d)
    k = (h @ wk + bk).reshape(b, n, num_heads, d)
    v = (h @ wv + bv).reshape(b, n, num_heads, d)
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k) / (d ** 0.5)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(b, n, c)
    return (xf + layerscale * (o @ wproj + bproj)).astype(x.dtype)
