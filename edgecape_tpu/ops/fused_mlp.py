"""Fused LayerNorm + MLP + LayerScale residual (Pallas, TPU).

The ViT block's second half — y = x + ls * (gelu(LN(x) @ W1 + b1) @ W2 +
b2) — is memory-bound as separate XLA ops: x is re-read for LN, the
[N, 4C] intermediate round-trips HBM, and the residual re-reads x again.
This kernel streams x through VMEM once per token tile with all weights
resident (W1+W2 at C=384: ~2.4MB bf16), computing LN statistics in fp32 on
the VPU and both matmuls on the MXU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, scale_ref, bias_ref, w1_ref, b1_ref, w2_ref, b2_ref,
            ls_ref, o_ref, *, eps: float):
    x = x_ref[:].astype(jnp.float32)                      # [T, C]
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
    h = (x - mean) * jax.lax.rsqrt(var + eps)
    h = h * scale_ref[0].astype(jnp.float32) + bias_ref[0].astype(
        jnp.float32)
    h = h.astype(jnp.bfloat16)
    f = jax.lax.dot_general(h, w1_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    f = f + b1_ref[0].astype(jnp.float32)
    # tanh-approximate gelu (erf is not lowerable in Pallas TPU; the
    # approximation error ~1e-3 is below bf16 activation noise)
    f = 0.5 * f * (1.0 + jnp.tanh(
        0.7978845608028654 * (f + 0.044715 * f ** 3)))
    f = f.astype(jnp.bfloat16)
    g = jax.lax.dot_general(f, w2_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    g = g + b2_ref[0].astype(jnp.float32)
    o_ref[:] = (x + ls_ref[0].astype(jnp.float32) * g).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "eps"))
def fused_ln_mlp(x, ln_scale, ln_bias, w1, b1, w2, b2, layerscale, *,
                 eps: float = 1e-6, interpret: bool = False):
    """y = x + layerscale * (gelu(LN(x) @ w1 + b1) @ w2 + b2).

    x: [..., N, C]; w1 [C, F]; w2 [F, C]. Computation in bf16 with fp32 LN
    statistics and fp32 matmul accumulation.
    """
    orig_shape = x.shape
    c = orig_shape[-1]
    f = w1.shape[-1]
    xt = x.reshape(-1, c)
    n = xt.shape[0]
    tile = 512 if n >= 512 else max(8, ((n + 7) // 8) * 8)
    n_pad = ((n + tile - 1) // tile) * tile
    if n_pad != n:
        xt = jnp.pad(xt, [(0, n_pad - n), (0, 0)])

    w1b = w1.astype(jnp.bfloat16)
    w2b = w2.astype(jnp.bfloat16)
    rep = lambda i: (0, 0)  # noqa: E731 — weights replicated per program

    vec = lambda v: v.reshape(1, -1)  # noqa: E731 — 2-D for SMEM/VMEM tiling
    out = pl.pallas_call(
        functools.partial(_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((n_pad, c), x.dtype),
        grid=(n_pad // tile,),
        in_specs=[
            pl.BlockSpec((tile, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((c, f), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((f, c), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), rep, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xt, vec(ln_scale), vec(ln_bias), w1b, vec(b1), w2b, vec(b2),
      vec(layerscale))
    return out[:n].reshape(orig_shape)


def reference_ln_mlp(x, ln_scale, ln_bias, w1, b1, w2, b2, layerscale,
                     eps: float = 1e-6):
    """Pure-jnp reference with identical semantics."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mean) ** 2, axis=-1, keepdims=True)
    h = (xf - mean) * jax.lax.rsqrt(var + eps)
    h = h * ln_scale + ln_bias
    f = jax.nn.gelu(h @ w1 + b1, approximate=False)
    return (xf + layerscale * (f @ w2 + b2)).astype(x.dtype)
