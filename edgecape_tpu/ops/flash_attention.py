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


# --------------------------------------------------------------------------
# Differentiable flash attention (training path)
# --------------------------------------------------------------------------
#
# custom_vjp pair of Pallas kernels: the forward reuses the fused
# softmax(qk^T/sqrt(D) + bias + key_bias)v shape above (one program per
# batch*head row, whole score matrix in VMEM), the backward recomputes
# probabilities in VMEM and emits dq/dk/dv (+dbias) without ever
# materializing [bh, Nq, Nk] score/prob tensors in HBM — the XLA autodiff
# path stores the fp32 probs for the backward pass, which at the head's
# [128, 356, 356] train shapes is the dominant HBM traffic.
#
# Attention-prob dropout (torch MultiheadAttention train semantics,
# reference encoder_decoder.py dropout=0.1) runs IN-KERNEL from the TPU
# PRNG: the backward reseeds with the same per-program seed and
# regenerates the identical keep mask. The dropout PATTERN therefore
# differs from the XLA path's flax stream — dropout is stochastic
# regularization with no bit-parity requirement (the reference's torch
# stream differs from flax too); rate and scaling match exactly.


def _train_fwd_kernel(q_ref, k_ref, v_ref, kb_ref, bias_ref, seed_ref,
                      o_ref, *, scale: float, rate: float, has_bias: bool):
    if rate > 0.0:
        pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    thresh = min(int(rate * 2 ** 32), 2 ** 32 - 1)
    inv_keep = 1.0 / (1.0 - rate) if rate > 0.0 else 1.0
    for g in range(q_ref.shape[0]):
        q = q_ref[g].astype(jnp.bfloat16)
        k = k_ref[g].astype(jnp.bfloat16)
        v = v_ref[g].astype(jnp.bfloat16)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        s = s + kb_ref[g]           # key bias: 0 valid / -inf masked+pad
        if has_bias:
            s = s + bias_ref[g]
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        if rate > 0.0:
            bits = pltpu.prng_random_bits(p.shape)
            keep = bits.astype(jnp.uint32) >= jnp.uint32(thresh)
            p = jnp.where(keep, p * inv_keep, 0.0)
        o = jax.lax.dot_general(
            p.astype(jnp.bfloat16), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[g] = o.astype(o_ref.dtype)


def _train_bwd_kernel(q_ref, k_ref, v_ref, kb_ref, bias_ref, do_ref,
                      seed_ref, dq_ref, dk_ref, dv_ref, dbias_ref, *,
                      scale: float, rate: float, has_bias: bool):
    if rate > 0.0:
        pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    thresh = min(int(rate * 2 ** 32), 2 ** 32 - 1)
    inv_keep = 1.0 / (1.0 - rate) if rate > 0.0 else 1.0
    for g in range(q_ref.shape[0]):
        q = q_ref[g].astype(jnp.bfloat16)
        k = k_ref[g].astype(jnp.bfloat16)
        v = v_ref[g].astype(jnp.bfloat16)
        do = do_ref[g].astype(jnp.bfloat16)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        s = s + kb_ref[g]
        if has_bias:
            s = s + bias_ref[g]
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = e / jnp.sum(e, axis=-1, keepdims=True)     # pre-dropout probs
        if rate > 0.0:
            # identical seed + identical generation order -> identical mask
            bits = pltpu.prng_random_bits(p.shape)
            keep = bits.astype(jnp.uint32) >= jnp.uint32(thresh)
            pd = jnp.where(keep, p * inv_keep, 0.0)
        else:
            pd = p
        dv = jax.lax.dot_general(
            pd.astype(jnp.bfloat16), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # [Nk, D]
        dpd = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)        # [Nq, Nk]
        dp = jnp.where(keep, dpd * inv_keep, 0.0) if rate > 0.0 else dpd
        # softmax jacobian: ds = p * (dp - sum_k(dp * p))
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        if has_bias:
            dbias_ref[g] = ds.astype(dbias_ref.dtype)
        dsb = ds.astype(jnp.bfloat16)
        dq = jax.lax.dot_general(
            dsb, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        dk = jax.lax.dot_general(
            dsb, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        dq_ref[g] = dq.astype(dq_ref.dtype)
        dk_ref[g] = dk.astype(dk_ref.dtype)
        dv_ref[g] = dv.astype(dv_ref.dtype)


def _train_pack(q, k, v, kb, bias):
    """[B, N, H, D] -> padded [B*H, N_pad, D] blocks + padded kb/bias."""
    b, nq, h, d = q.shape
    nk = k.shape[1]
    qt = q.transpose(0, 2, 1, 3).reshape(b * h, nq, d)
    kt = k.transpose(0, 2, 1, 3).reshape(b * h, nk, d)
    vt = v.transpose(0, 2, 1, 3).reshape(b * h, nk, d)
    nq_pad = _round_up(nq, 8)
    nk_pad = _round_up(nk, 128 if nk >= 128 else 16)
    if nq_pad != nq:
        qt = jnp.pad(qt, [(0, 0), (0, nq_pad - nq), (0, 0)])
    if nk_pad != nk:
        pad = [(0, 0), (0, nk_pad - nk), (0, 0)]
        kt, vt = (jnp.pad(x, pad) for x in (kt, vt))
    # key bias folds key_valid AND key padding: -inf columns never attend
    kb_full = jnp.full((b, nk_pad), -jnp.inf, jnp.float32)
    kb_full = kb_full.at[:, :nk].set(
        jnp.where(kb, 0.0, -jnp.inf) if kb is not None else 0.0)
    kb_full = jnp.repeat(kb_full[:, None, None, :], h, axis=1).reshape(
        b * h, 1, nk_pad)
    if bias is not None:
        bias_full = jnp.pad(
            bias.astype(jnp.float32).reshape(b * h, nq, nk),
            [(0, 0), (0, nq_pad - nq), (0, nk_pad - nk)])
    else:
        bias_full = jnp.zeros((b * h, 1, 1), jnp.float32)  # dummy block
    return qt, kt, vt, kb_full, bias_full, nq_pad, nk_pad


def _train_specs(bh, nq_pad, nk_pad, d, has_bias):
    spec_q = pl.BlockSpec((1, nq_pad, d), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_k = pl.BlockSpec((1, nk_pad, d), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_kb = pl.BlockSpec((1, 1, nk_pad), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    if has_bias:
        spec_bias = pl.BlockSpec((1, nq_pad, nk_pad), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        spec_bias = pl.BlockSpec((1, 1, 1), lambda i: (0, 0, 0),
                                 memory_space=pltpu.VMEM)
    spec_seed = pl.BlockSpec(memory_space=pltpu.SMEM)
    return spec_q, spec_k, spec_kb, spec_bias, spec_seed


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _flash_train(q, k, v, key_valid, bias, seed, rate, has_bias,
                 interpret):
    out, _ = _flash_train_fwd(q, k, v, key_valid, bias, seed, rate,
                              has_bias, interpret)
    return out


def _flash_train_fwd(q, k, v, key_valid, bias, seed, rate, has_bias,
                     interpret):
    b, nq, h, d = q.shape
    nk = k.shape[1]
    out_dtype = q.dtype
    qb, kb_, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
    qt, kt, vt, kbf, biasf, nq_pad, nk_pad = _train_pack(
        qb, kb_, vb, key_valid, bias)
    bh = b * h
    scale = 1.0 / math.sqrt(d)
    spec_q, spec_k, spec_kb, spec_bias, spec_seed = _train_specs(
        bh, nq_pad, nk_pad, d, has_bias)
    out = pl.pallas_call(
        functools.partial(_train_fwd_kernel, scale=scale, rate=rate,
                          has_bias=has_bias),
        out_shape=jax.ShapeDtypeStruct((bh, nq_pad, d), jnp.float32),
        grid=(bh,),
        in_specs=[spec_q, spec_k, spec_k, spec_kb, spec_bias, spec_seed],
        out_specs=spec_q,
        interpret=interpret,
    )(qt, kt, vt, kbf, biasf, seed)
    out = out[:, :nq, :].reshape(b, h, nq, d).transpose(0, 2, 1, 3)
    return out.astype(out_dtype), (q, k, v, key_valid, bias, seed)


def _flash_train_bwd(rate, has_bias, interpret, res, g_out):
    q, k, v, key_valid, bias, seed = res
    b, nq, h, d = q.shape
    nk = k.shape[1]
    qb, kb_, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
    qt, kt, vt, kbf, biasf, nq_pad, nk_pad = _train_pack(
        qb, kb_, vb, key_valid, bias)
    bh = b * h
    scale = 1.0 / math.sqrt(d)
    do = g_out.astype(jnp.float32).transpose(0, 2, 1, 3).reshape(
        bh, nq, d)
    if nq_pad != nq:
        do = jnp.pad(do, [(0, 0), (0, nq_pad - nq), (0, 0)])
    spec_q, spec_k, spec_kb, spec_bias, spec_seed = _train_specs(
        bh, nq_pad, nk_pad, d, has_bias)
    out_shapes = (
        jax.ShapeDtypeStruct((bh, nq_pad, d), jnp.float32),    # dq
        jax.ShapeDtypeStruct((bh, nk_pad, d), jnp.float32),    # dk
        jax.ShapeDtypeStruct((bh, nk_pad, d), jnp.float32),    # dv
        jax.ShapeDtypeStruct(
            (bh, nq_pad, nk_pad) if has_bias else (bh, 1, 1),
            jnp.float32),                                      # dbias
    )
    dbias_spec = (pl.BlockSpec((1, nq_pad, nk_pad), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM) if has_bias
                  else pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                                    memory_space=pltpu.VMEM))
    dq_p, dk_p, dv_p, dbias_p = pl.pallas_call(
        functools.partial(_train_bwd_kernel, scale=scale, rate=rate,
                          has_bias=has_bias),
        out_shape=out_shapes,
        grid=(bh,),
        in_specs=[spec_q, spec_k, spec_k, spec_kb, spec_bias, spec_q,
                  spec_seed],
        out_specs=(spec_q, spec_k, spec_k, dbias_spec),
        interpret=interpret,
    )(qt, kt, vt, kbf, biasf, do, seed)
    dq = dq_p[:, :nq].reshape(b, h, nq, d).transpose(0, 2, 1, 3).astype(
        q.dtype)
    dk = dk_p[:, :nk].reshape(b, h, nk, d).transpose(0, 2, 1, 3).astype(
        k.dtype)
    dv = dv_p[:, :nk].reshape(b, h, nk, d).transpose(0, 2, 1, 3).astype(
        v.dtype)
    if has_bias:
        dbias = dbias_p[:, :nq, :nk].reshape(b, h, nq, nk).astype(
            bias.dtype)
    else:
        dbias = None
    # integer/bool primals take float0 cotangents
    import numpy as np
    from jax import dtypes
    d_valid = (None if key_valid is None
               else np.zeros(key_valid.shape, dtypes.float0))
    return dq, dk, dv, d_valid, dbias, np.zeros(seed.shape, dtypes.float0)


_flash_train.defvjp(_flash_train_fwd, _flash_train_bwd)


def flash_mha_train(q, k, v, key_valid=None, bias=None, *,
                    dropout_rate: float = 0.0, dropout_rng=None,
                    interpret: bool = False):
    """Differentiable fused attention for the TRAIN step.

    q [B, Nq, H, D]; k/v [B, Nk, H, D]; key_valid optional [B, Nk] bool;
    bias optional additive pre-softmax logits [B, H, Nq, Nk] (the Markov
    structural bias — receives a real gradient). dropout_rate applies
    torch-style attention-prob dropout in-kernel (requires dropout_rng
    when > 0); the backward regenerates the identical mask from the same
    seed. Matmuls run bf16 with fp32 accumulation in both directions.
    """
    if dropout_rate > 0.0:
        assert dropout_rng is not None, "dropout needs an rng key"
        seed = jax.random.randint(dropout_rng, (1,), minval=0,
                                  maxval=jnp.iinfo(jnp.int32).max,
                                  dtype=jnp.int32)
    else:
        seed = jnp.zeros((1,), jnp.int32)
    return _flash_train(q, k, v, key_valid, bias, seed,
                        float(dropout_rate), bias is not None,
                        bool(interpret))
