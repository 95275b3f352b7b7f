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
