import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from edgecape_tpu.config import ModelConfig
from edgecape_tpu.models.edgecape import EdgeCape, init_model

K, G = 12, 4


def _setup(seed=0, **cfg_kw):
    cfg = ModelConfig(max_kpt=K, image_size=56, heatmap_size=16, **cfg_kw)
    rng = np.random.default_rng(seed)
    feat_q = jnp.asarray(rng.normal(size=(3, G, G, 384)), jnp.float32)
    feat_s = jnp.asarray(rng.normal(size=(3, 1, G, G, 384)), jnp.float32)
    tgt_s = jnp.asarray(rng.uniform(size=(3, 1, K, 16, 16)), jnp.float32)
    mask = np.ones((3, K), np.float32)
    mask[0, 8:] = 0.0
    adj = np.zeros((3, K, K), np.float32)
    for i, j in [(0, 1), (1, 2), (2, 3)]:
        adj[:, i, j] = adj[:, j, i] = 1.0
    model, params = init_model(jax.random.PRNGKey(seed + 1), cfg,
                               batch=1, shots=1)
    inputs = (feat_q, feat_s, tgt_s, jnp.asarray(mask), jnp.asarray(adj))
    return cfg, params, inputs


def _full(cfg, params, inputs):
    model = EdgeCape(cfg)
    return model.apply({"params": params}, *inputs)


@pytest.mark.parametrize("stage_kw", [
    dict(),
    dict(learn_skeleton=True, attn_bias=True, use_bias_attn_module=True),
])
def test_fused_decoder_matches_flax(stage_kw):
    """Decoder-isolated parity: the SAME encoder outputs pushed through
    the fused Pallas decoder (interpreter off-TPU) vs the flax decoder,
    same params — including the Markov-biased self-attention at stage 3."""
    cfg, params, inputs = _setup(**stage_kw)
    plain = _full(cfg, params, inputs)
    enc = plain.encode

    fused_model = EdgeCape(dataclasses.replace(cfg, use_flash=True))
    outs, _ = fused_model.apply(
        {"params": params}, enc.kp_tokens, enc.img_tokens, enc.proposals,
        enc.adj, enc.hop_stack, enc.kp_valid, enc.img_pos,
        method=EdgeCape.decode)

    p, f = np.asarray(plain.outputs), np.asarray(outs)
    mask = np.asarray(inputs[3]) > 0                      # [B, K]
    d = np.abs(p - f)[:, mask]
    # coords in [0,1]; bf16 kernel resolution, no proposal divergence
    assert np.median(d) < 2e-3, np.median(d)
    assert np.quantile(d, 0.95) < 0.01, np.quantile(d, 0.95)


def test_fused_full_forward_close_to_flax():
    """Whole-pipeline smoke: fused encoder + decoder vs flax; compounding
    bf16 differences (and local-softargmax window jumps under random
    weights) stay sub-pixel in distribution."""
    cfg, params, inputs = _setup(learn_skeleton=True, attn_bias=True,
                                 use_bias_attn_module=True)
    plain = _full(cfg, params, inputs)
    fused = _full(dataclasses.replace(cfg, use_flash=True), params, inputs)
    p, f = np.asarray(plain.outputs), np.asarray(fused.outputs)
    mask = np.asarray(inputs[3]) > 0
    d = np.abs(p - f)[:, mask]
    assert np.median(d) < 0.01, np.median(d)
    assert (d > 0.05).mean() < 0.05, (d > 0.05).mean()
    # adjacency comes from the (unfused) support phase: tight
    np.testing.assert_allclose(np.asarray(fused.encode.adj),
                               np.asarray(plain.encode.adj), atol=1e-5)


@pytest.mark.slow  # 60s of jit: secondary invariant, slow-suite only
def test_fused_paths_off_during_train_mode():
    """train=True must take the flax path (dropout, gradients) even with
    use_flash enabled — outputs under a fixed dropout rng stay finite and
    params receive gradients."""
    cfg, params, inputs = _setup(learn_skeleton=True, use_flash=True)
    model = EdgeCape(dataclasses.replace(cfg, dropout=0.0))

    def loss(p):
        out = model.apply({"params": p}, *inputs, train=True,
                          rngs={"dropout": jax.random.PRNGKey(0)})
        return jnp.sum(out.outputs ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
    total = sum(float(jnp.sum(jnp.abs(x))) for x in leaves)
    assert total > 0.0
