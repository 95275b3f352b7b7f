import numpy as np
import pytest

import jax
import jax.numpy as jnp

from edgecape_tpu.ops import flash_attention as fa


@pytest.mark.parametrize("b,n,h,d", [
    (2, 257, 6, 64),   # ViT-S/14 @ 224
    (3, 100, 8, 32),   # keypoint tokens
    (1, 356, 8, 32),   # encoder concat length
    (2, 128, 4, 64),   # exact tile
])
def test_flash_matches_reference(b, n, h, d):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(b, n, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, n, h, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, n, h, d)), jnp.float32)
    ref = np.asarray(fa.reference_mha(q, k, v))
    out = np.asarray(fa.flash_mha(q, k, v, interpret=True))
    # kernel computes in bf16 -> tolerance at bf16 resolution
    np.testing.assert_allclose(out, ref, atol=0.02, rtol=0.02)


def test_flash_padded_keys_excluded():
    """Outputs must not depend on the zero-padded key rows: compare n=257
    against a manual computation restricted to the real keys."""
    rng = np.random.default_rng(1)
    b, n, h, d = 1, 130, 2, 64  # pads to 256
    q = jnp.asarray(rng.normal(size=(b, n, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, n, h, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, n, h, d)), jnp.float32)
    out = np.asarray(fa.flash_mha(q, k, v, interpret=True))
    ref = np.asarray(fa.reference_mha(q, k, v))
    np.testing.assert_allclose(out, ref, atol=0.02, rtol=0.02)
    assert out.shape == (b, n, h, d)


def test_flash_key_valid_matches_masked_reference():
    rng = np.random.default_rng(2)
    b, n, h, d = 2, 100, 4, 32
    q = jnp.asarray(rng.normal(size=(b, n, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, n, h, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, n, h, d)), jnp.float32)
    valid = np.ones((b, n), bool)
    valid[0, 60:] = False
    valid_j = jnp.asarray(valid)
    out = np.asarray(fa.flash_mha(q, k, v, valid_j, interpret=True))
    # reference with -inf masking
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(d)
    s = jnp.where(valid_j[:, None, None, :], s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    ref = np.asarray(jnp.einsum("bhqk,bkhd->bqhd", p, v))
    np.testing.assert_allclose(out, ref, atol=0.02, rtol=0.02)


def test_flash_cross_attention_matches_reference():
    rng = np.random.default_rng(3)
    b, nq, nk, h, d = 2, 100, 256, 8, 64
    q = jnp.asarray(rng.normal(size=(b, nq, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, nk, h, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, nk, h, d)), jnp.float32)
    out = np.asarray(fa.flash_mha(q, k, v, interpret=True))
    ref = np.asarray(fa.reference_mha(q, k, v))
    assert out.shape == (b, nq, h, d)
    np.testing.assert_allclose(out, ref, atol=0.02, rtol=0.02)


# ------------------------------------------------------------------ train
def _masked_biased_reference(q, k, v, valid=None, bias=None):
    d = q.shape[-1]
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                   preferred_element_type=jnp.float32) / np.sqrt(d)
    if bias is not None:
        s = s + bias
    if valid is not None:
        s = jnp.where(valid[:, None, None, :], s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)


@pytest.mark.parametrize("use_valid,use_bias", [
    (False, False), (True, False), (False, True), (True, True)])
def test_flash_train_forward_matches_reference(use_valid, use_bias):
    rng = np.random.default_rng(4)
    b, n, h, d = 2, 36, 2, 32
    q = jnp.asarray(rng.normal(size=(b, n, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, n, h, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, n, h, d)), jnp.float32)
    valid = None
    if use_valid:
        va = np.ones((b, n), bool)
        va[0, 20:] = False
        valid = jnp.asarray(va)
    bias = (jnp.asarray(rng.normal(size=(b, h, n, n)), jnp.float32)
            if use_bias else None)
    out = np.asarray(fa.flash_mha_train(q, k, v, valid, bias,
                                        interpret=True))
    ref = np.asarray(_masked_biased_reference(q, k, v, valid, bias))
    np.testing.assert_allclose(out, ref, atol=0.02, rtol=0.02)


@pytest.mark.parametrize("use_valid,use_bias", [
    (False, False), (True, True)])
def test_flash_train_grads_match_xla(use_valid, use_bias):
    """custom_vjp vs jax.grad of the XLA reference path: dq/dk/dv (and
    dbias) at bf16-kernel tolerance, including masked keys."""
    rng = np.random.default_rng(5)
    b, n, h, d = 2, 24, 2, 16
    q = jnp.asarray(rng.normal(size=(b, n, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, n, h, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, n, h, d)), jnp.float32)
    g_out = jnp.asarray(rng.normal(size=(b, n, h, d)), jnp.float32)
    valid = None
    if use_valid:
        va = np.ones((b, n), bool)
        va[1, 15:] = False
        valid = jnp.asarray(va)
    bias = (jnp.asarray(0.3 * rng.normal(size=(b, h, n, n)), jnp.float32)
            if use_bias else None)

    def loss_flash(q, k, v, bias):
        return jnp.sum(fa.flash_mha_train(q, k, v, valid, bias,
                                          interpret=True) * g_out)

    def loss_ref(q, k, v, bias):
        return jnp.sum(_masked_biased_reference(q, k, v, valid, bias)
                       * g_out)

    args = (q, k, v, bias) if use_bias else (q, k, v, None)
    nargs = 4 if use_bias else 3
    g_flash = jax.grad(loss_flash, argnums=tuple(range(nargs)))(*args)
    g_ref = jax.grad(loss_ref, argnums=tuple(range(nargs)))(*args)
    names = ["dq", "dk", "dv", "dbias"]
    for name, gf, gr in zip(names, g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   atol=0.05, rtol=0.05, err_msg=name)


def test_flash_train_dropout_mask_consistency():
    """rate>0: infer the realized keep-mask from the forward (one-hot v
    makes out[q, k] == dropped-prob p_d[q, k]), then check (a) rate and
    scaling statistics, (b) the backward used the SAME mask by comparing
    dv against the analytic p_d^T g computed from the inferred probs."""
    if jax.default_backend() not in ("tpu",):
        try:
            _probe_kernel_prng()
        except Exception:
            pytest.skip("pallas TPU PRNG not supported in interpret mode "
                        "on this backend")
    rate = 0.4
    rng = np.random.default_rng(6)
    b, n, h = 1, 16, 1
    d = n  # one-hot v exposes probs
    q = jnp.asarray(rng.normal(size=(b, n, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, n, h, d)), jnp.float32)
    v = jnp.asarray(np.eye(n)[None, :, None, :], jnp.float32)
    g_out = jnp.asarray(rng.normal(size=(b, n, h, d)), jnp.float32)
    key = jax.random.PRNGKey(3)

    def fwd(q, k, v):
        return fa.flash_mha_train(q, k, v, dropout_rate=rate,
                                  dropout_rng=key, interpret=True)

    out = np.asarray(fwd(q, k, v))          # [1, n, 1, n] = p_dropped
    out2 = np.asarray(fwd(q, k, v))
    np.testing.assert_array_equal(out, out2)  # same seed -> same mask
    p_d = out[0, :, 0, :]
    # full probs without dropout for comparison
    p_full = np.asarray(_masked_biased_reference(q, k, v))[0, :, 0, :]
    kept = p_d > 0
    frac = kept.mean()
    assert 0.4 < frac < 0.8  # ~1-rate kept
    # kept entries scaled by 1/(1-rate)
    np.testing.assert_allclose(p_d[kept], p_full[kept] / (1 - rate),
                               atol=0.03, rtol=0.05)
    # backward consistency: dv must equal p_d^T @ g for the SAME mask
    dv = jax.grad(lambda v: jnp.sum(fwd(q, k, v) * g_out))(v)
    dv = np.asarray(dv)[0, :, 0, :]
    g = np.asarray(g_out)[0, :, 0, :]
    np.testing.assert_allclose(dv, p_d.T @ g, atol=0.05, rtol=0.05)


def _probe_kernel_prng():
    """Tiny pallas_call exercising the TPU PRNG in interpret mode."""
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kern(s_ref, o_ref):
        pltpu.prng_seed(s_ref[0], pl.program_id(0))
        o_ref[...] = pltpu.prng_random_bits(o_ref.shape).astype(
            jnp.int32)

    pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        interpret=True,
    )(jnp.zeros((1,), jnp.int32))
