"""Fused multi-head self-attention (Pallas, TPU).

The ViT backbone's attention dominates the forward cost when expressed as
separate XLA ops (score matmul -> fp32 softmax materialized in HBM -> value
matmul, ~800MB of intermediates per block at eval batch sizes). This kernel
keeps the whole per-(batch*head, q-tile) attention in VMEM: one
[TILE_Q, D] x [D, N] MXU matmul, VPU softmax with padded-key masking, one
[TILE_Q, N] x [N, D] matmul — no HBM round trips for scores.

Sequence lengths here are small and static (257 ViT tokens, <=356 head
tokens), so no online-softmax streaming is needed: full K/V rows fit VMEM
comfortably (257 x 64 bf16 = 33KB).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, n_real: int,
                 kb_ref=None):
    # blocks: q/o [G, TILE_Q, D], k/v [G, N_pad, D], optional key bias
    # kb [G, 1, N_pad] (0 or -inf per key; carries padding-validity masks);
    # loop over the G (batch*head) rows to amortize grid/DMA overhead
    n_pad = k_ref.shape[1]
    for g in range(q_ref.shape[0]):
        q = q_ref[g].astype(jnp.bfloat16)
        k = k_ref[g].astype(jnp.bfloat16)
        v = v_ref[g].astype(jnp.bfloat16)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # [TILE_Q, N_pad]
        if kb_ref is not None:
            s = s + kb_ref[g]
        if n_real < n_pad:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < n_real, s, -jnp.inf)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(jnp.bfloat16)
        o = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[g] = o.astype(o_ref.dtype)


def _kernel_with_bias(q_ref, k_ref, v_ref, kb_ref, o_ref, *, scale, n_real):
    _attn_kernel(q_ref, k_ref, v_ref, o_ref, scale=scale, n_real=n_real,
                 kb_ref=kb_ref)


@functools.partial(jax.jit, static_argnames=("interpret",))
def flash_mha(q, k, v, key_valid=None, *, interpret: bool = False):
    """Fused softmax(q k^T / sqrt(D) + key_bias) v.

    q: [B, Nq, H, D]; k/v: [B, Nk, H, D] -> [B, Nq, H, D] (self- and
    cross-attention). key_valid: optional [B, Nk] bool — invalid keys are
    excluded from the softmax (the torch key_padding_mask semantics).
    """
    b, nq, h, d = q.shape
    nk = k.shape[1]
    out_dtype = q.dtype
    # the kernel computes in bf16 regardless; cast before the call so VMEM
    # blocks are half-size even for fp32 callers
    q, k, v = (x.astype(jnp.bfloat16) for x in (q, k, v))
    qt = q.transpose(0, 2, 1, 3).reshape(b * h, nq, d)
    kt = k.transpose(0, 2, 1, 3).reshape(b * h, nk, d)
    vt = v.transpose(0, 2, 1, 3).reshape(b * h, nk, d)

    scale = 1.0 / math.sqrt(d)
    # single q-tile per (batch, head) when the query set is short (the
    # ViT's 257 tokens, the head's <=356): K/V are DMA'd once per program.
    # Query rows only need sublane (8) alignment — keys keep 128-lane
    # padding below (they are the lane dim of the score block).
    if nq <= 512:
        tile_q = _round_up(nq, 8 if nq >= 128 else 16)
    else:
        tile_q = 128
    nq_pad = _round_up(nq, tile_q)
    nk_pad = _round_up(nk, 128 if nk >= 128 else 16)
    if nq_pad != nq:
        qt = jnp.pad(qt, [(0, 0), (0, nq_pad - nq), (0, 0)])
    if nk_pad != nk:
        pad = [(0, 0), (0, nk_pad - nk), (0, 0)]
        kt, vt = (jnp.pad(x, pad) for x in (kt, vt))
    bh = b * h
    # group size: amortize per-program overhead while staying inside the
    # 16MB scoped-VMEM limit (4 blocks, double-buffered, + score scratch)
    group = 1
    itemsize = 2  # bf16 blocks
    if nq_pad == tile_q:
        for g in (16, 12, 8, 4, 2):
            need = (2 * 2 * g * (nq_pad + nk_pad) * d * itemsize
                    + 2 * tile_q * nk_pad * 4)
            if bh % g == 0 and need < 12 * 1024 * 1024:
                group = g
                break

    in_specs = [
        pl.BlockSpec((group, tile_q, d), lambda bi, i: (bi, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((group, nk_pad, d), lambda bi, i: (bi, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((group, nk_pad, d), lambda bi, i: (bi, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [qt, kt, vt]
    if key_valid is not None:
        kb = jnp.where(key_valid, 0.0, -jnp.inf).astype(jnp.float32)
        kb = jnp.pad(kb, [(0, 0), (0, nk_pad - nk)],
                     constant_values=-jnp.inf)
        kb = jnp.repeat(kb[:, None, None, :], h, axis=1).reshape(
            bh, 1, nk_pad)
        in_specs.append(pl.BlockSpec((group, 1, nk_pad),
                                     lambda bi, i: (bi, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(kb)
        kernel = functools.partial(_kernel_with_bias, scale=scale,
                                   n_real=nk)
    else:
        kernel = functools.partial(_attn_kernel, scale=scale, n_real=nk)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bh, nq_pad, d), jnp.bfloat16),
        grid=(bh // group, nq_pad // tile_q),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((group, tile_q, d), lambda bi, i: (bi, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*args)
    out = out[:, :nq, :].reshape(b, h, nq, d).transpose(0, 2, 1, 3)
    return out.astype(out_dtype)


def reference_mha(q, k, v):
    """Pure-jnp reference with identical semantics ([B, N, H, D])."""
    d = q.shape[-1]
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                   preferred_element_type=jnp.float32) / math.sqrt(d)
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)
