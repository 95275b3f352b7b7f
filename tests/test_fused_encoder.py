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


def _stack_layers(n_layers, c=256, f=384, seed=11):
    rng = np.random.default_rng(seed)
    mk = lambda *sh, s=0.05: jnp.asarray(  # noqa: E731
        rng.normal(size=sh) * s, jnp.float32)
    return tuple(
        (mk(c, c), mk(c, s=0.1), mk(c, c), mk(c, s=0.1),
         mk(c, c), mk(c, s=0.1), mk(c, c), mk(c, s=0.1),
         jnp.ones(c) + mk(c, s=0.02), mk(c, s=0.1),
         mk(c, f), mk(f, s=0.1), mk(f, c), mk(c, s=0.1),
         jnp.ones(c) + mk(c, s=0.02), mk(c, s=0.1))
        for _ in range(n_layers))


def test_fused_encoder_stack_bit_identical_to_chain():
    """The whole-encoder kernel must equal the per-layer chain BITWISE:
    it is a pure perf switch (pallas_config.encoder_stack_default), so
    any numeric difference would make the switch numerics-affecting."""
    tokens, pos, valid = _args()[:3]
    layers = _stack_layers(3)
    chained = tokens
    for lw in layers:
        chained = fe.fused_encoder_layer(chained, pos, valid, *lw,
                                         num_heads=8, interpret=True)
    stacked = fe.fused_encoder_stack(tokens, pos, valid, layers,
                                     num_heads=8, interpret=True)
    np.testing.assert_array_equal(np.asarray(stacked),
                                  np.asarray(chained))


def test_fused_encoder_stack_bit_identical_bf16_tokens():
    """Same bitwise contract when the inter-layer HBM value is bf16
    (head_dtype bfloat16 eval): the stack's in-register rounding must
    match the chain's boundary rounding."""
    tokens, pos, valid = _args(seed=3)[:3]
    tokens = tokens.astype(jnp.bfloat16)
    layers = _stack_layers(2, seed=13)
    chained = tokens
    for lw in layers:
        chained = fe.fused_encoder_layer(chained, pos, valid, *lw,
                                         num_heads=8, interpret=True)
    stacked = fe.fused_encoder_stack(tokens, pos, valid, layers,
                                     num_heads=8, interpret=True)
    np.testing.assert_array_equal(np.asarray(stacked),
                                  np.asarray(chained))


def test_encode_query_stack_path_bit_matches_layer_path():
    """encode_query with the encoder-stack switch on == switch off,
    bitwise, through the real model glue."""
    import dataclasses

    from edgecape_tpu.config import ModelConfig
    from edgecape_tpu.models.edgecape import EdgeCape, init_model
    from edgecape_tpu.ops import pallas_config

    K, G = 12, 4
    cfg = ModelConfig(max_kpt=K, image_size=56, heatmap_size=16,
                      use_flash=True)
    rng = np.random.default_rng(2)
    feat_q = jnp.asarray(rng.normal(size=(2, G, G, 384)), jnp.float32)
    feat_s = jnp.asarray(rng.normal(size=(2, 1, G, G, 384)), jnp.float32)
    tgt_s = jnp.asarray(rng.uniform(size=(2, 1, K, 16, 16)), jnp.float32)
    mask = np.ones((2, K), np.float32)
    adj = np.zeros((2, K, K), np.float32)
    _, params = init_model(jax.random.PRNGKey(0), cfg, batch=1, shots=1)

    def run():
        m = EdgeCape(cfg)

        def fn(mdl):
            ctx = mdl.encode_support(feat_s, tgt_s, jnp.asarray(mask),
                                     jnp.asarray(adj))
            return mdl.encode_query(feat_q, ctx)
        return m.apply({"params": params}, method=lambda mdl: fn(mdl))

    try:
        pallas_config.set_encoder_stack(False)
        per_layer = run()
        pallas_config.set_encoder_stack(True)
        stacked = run()
    finally:
        pallas_config.set_encoder_stack(None)
    np.testing.assert_array_equal(np.asarray(stacked.img_tokens),
                                  np.asarray(per_layer.img_tokens))
    np.testing.assert_array_equal(np.asarray(stacked.kp_tokens),
                                  np.asarray(per_layer.kp_tokens))
    np.testing.assert_array_equal(np.asarray(stacked.proposals),
                                  np.asarray(per_layer.proposals))
