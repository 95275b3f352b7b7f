import numpy as np

import jax
import jax.numpy as jnp

from edgecape_tpu.ops import fused_encoder as fe


def _args(b=4, n=166, c=256, f=384, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda *sh, s=0.05: jnp.asarray(  # noqa: E731
        rng.normal(size=sh) * s, jnp.float32)
    tokens = jnp.asarray(rng.normal(size=(b, n, c)), jnp.float32)
    pos = jnp.asarray(rng.normal(size=(n, c)) * 0.5, jnp.float32)
    valid = np.ones((b, n), bool)
    valid[0, n - 5:] = False          # masked keypoint slots
    if b > 2:
        valid[2, n - 30:] = False
    return (tokens, pos, jnp.asarray(valid),
            mk(c, c), mk(c, s=0.1), mk(c, c), mk(c, s=0.1),
            mk(c, c), mk(c, s=0.1), mk(c, c), mk(c, s=0.1),
            jnp.ones(c), mk(c, s=0.1),
            mk(c, f), mk(f, s=0.1), mk(f, c), mk(c, s=0.1),
            jnp.ones(c), mk(c, s=0.1))


def test_fused_encoder_layer_matches_reference():
    args = _args()
    ref = np.asarray(fe.reference_encoder_layer(*args, num_heads=8))
    out = np.asarray(fe.fused_encoder_layer(*args, num_heads=8,
                                            interpret=True))
    assert out.shape == ref.shape
    # post-LN outputs are ~N(0,1); bf16 matmul resolution
    assert np.abs(out - ref).max() < 0.05
    assert np.abs(out - ref).mean() < 0.005


def test_fused_encoder_layer_mask_semantics():
    """Invalid keys must not influence valid rows: flipping the CONTENT of
    masked tokens changes nothing outside those tokens."""
    args = list(_args(b=2, n=100))
    valid = np.ones((2, 100), bool)
    valid[:, 90:] = False
    args[2] = jnp.asarray(valid)
    out1 = np.asarray(fe.fused_encoder_layer(*args, num_heads=8,
                                             interpret=True))
    tokens = np.asarray(args[0]).copy()
    tokens[:, 90:] += 7.0
    args[0] = jnp.asarray(tokens)
    out2 = np.asarray(fe.fused_encoder_layer(*args, num_heads=8,
                                             interpret=True))
    np.testing.assert_allclose(out1[:, :90], out2[:, :90], atol=1e-5)


def test_encode_query_fused_path_matches_flax():
    """EdgeCape.encode_query with use_flash (fused Pallas encoder via the
    interpreter off-TPU) vs the plain flax path, same params."""
    import dataclasses

    from edgecape_tpu.config import ModelConfig
    from edgecape_tpu.models.edgecape import EdgeCape, init_model

    K, G = 12, 4
    cfg = ModelConfig(max_kpt=K, image_size=56, heatmap_size=16)
    rng = np.random.default_rng(1)
    feat_q = jnp.asarray(rng.normal(size=(3, G, G, 384)), jnp.float32)
    feat_s = jnp.asarray(rng.normal(size=(3, 1, G, G, 384)), jnp.float32)
    tgt_s = jnp.asarray(rng.uniform(size=(3, 1, K, 16, 16)), jnp.float32)
    mask = np.ones((3, K), np.float32)
    mask[0, 8:] = 0.0
    adj = np.zeros((3, K, K), np.float32)
    adj[:, 0, 1] = adj[:, 1, 0] = 1.0

    model, params = init_model(jax.random.PRNGKey(0), cfg, batch=1,
                               shots=1)

    def run(m_cfg):
        m = EdgeCape(m_cfg)

        def fn(mdl):
            ctx = mdl.encode_support(feat_s, tgt_s, jnp.asarray(mask),
                                     jnp.asarray(adj))
            return mdl.encode_query(feat_q, ctx)
        return m.apply({"params": params}, method=lambda mdl: fn(mdl))

    plain = run(cfg)
    fused = run(dataclasses.replace(cfg, use_flash=True))
    np.testing.assert_allclose(np.asarray(fused.kp_tokens),
                               np.asarray(plain.kp_tokens), atol=0.05)
    np.testing.assert_allclose(np.asarray(fused.img_tokens),
                               np.asarray(plain.img_tokens), atol=0.05)
    # proposals ride the fp32 similarity path; tighter
    d = np.abs(np.asarray(fused.proposals) - np.asarray(plain.proposals))
    assert np.median(d) < 5e-3


def test_fused_encoder_layer_odd_batch_padding():
    """b not divisible by the row group (e.g. the 510-query eval chunk):
    the wrapper pads batch rows and slices them back; padded rows must
    not perturb real ones."""
    a3 = _args(b=3, seed=5)
    ref = np.asarray(fe.reference_encoder_layer(*a3, num_heads=8))
    out = np.asarray(fe.fused_encoder_layer(*a3, num_heads=8,
                                            interpret=True))
    assert out.shape == ref.shape
    assert np.abs(out - ref).max() < 0.05
