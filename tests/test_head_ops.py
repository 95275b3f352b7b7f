import jax
import jax.numpy as jnp
import numpy as np

from edgecape_tpu.models.head import pool_support_keypoints


def _pool_reference(feats, hms):
    """Direct transcription of the reference pooling (upsample features,
    normalize heatmap, matmul)."""
    b, s, gh, gw, c = feats.shape
    _, _, k, hh, hw = hms.shape
    up = jax.image.resize(feats, (b, s, hh, hw, c), method="linear")
    hm = hms.reshape(b, s, k, hh * hw)
    hm = hm / (hm.sum(axis=-1, keepdims=True) + 1e-8)
    pooled = jnp.einsum("bskp,bspc->bskc", hm, up.reshape(b, s, hh * hw, c))
    return pooled.mean(axis=1)


def test_adjoint_pooling_equals_upsample_pooling():
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(2, 2, 16, 16, 8)), jnp.float32)
    hms = jnp.asarray(rng.uniform(size=(2, 2, 5, 64, 64)), jnp.float32)
    ours = np.asarray(pool_support_keypoints(feats, hms))
    ref = np.asarray(_pool_reference(feats, hms))
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_adjoint_pooling_zero_heatmap():
    feats = jnp.ones((1, 1, 4, 4, 3))
    hms = jnp.zeros((1, 1, 2, 16, 16))
    out = np.asarray(pool_support_keypoints(feats, hms))
    np.testing.assert_allclose(out, 0.0, atol=1e-6)
