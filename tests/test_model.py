import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from edgecape_tpu.config import ModelConfig
from edgecape_tpu.models.edgecape import EdgeCape

pytestmark = pytest.mark.slow  # heavy jit/model suite; excluded by -m 'not slow'

K = 12
G = 4  # feature grid


def _cfg(**kw):
    return ModelConfig(max_kpt=K, image_size=56, heatmap_size=16, **kw)


def _inputs(batch=2, shots=1, seed=0):
    rng = np.random.default_rng(seed)
    feat_q = jnp.asarray(rng.normal(size=(batch, G, G, 384)), jnp.float32)
    feat_s = jnp.asarray(rng.normal(size=(batch, shots, G, G, 384)),
                         jnp.float32)
    tgt_s = jnp.asarray(rng.uniform(size=(batch, shots, K, 16, 16)),
                        jnp.float32)
    mask = np.ones((batch, K), np.float32)
    mask[0, 8:] = 0.0
    adj = np.zeros((batch, K, K), np.float32)
    for i, j in [(0, 1), (1, 2), (2, 3)]:
        adj[:, i, j] = adj[:, j, i] = 1
    return feat_q, feat_s, tgt_s, jnp.asarray(mask), jnp.asarray(adj)


def _run(cfg, inputs, seed=0):
    model = EdgeCape(cfg)
    init = jax.jit(lambda r: model.init(
        {"params": r, "dropout": jax.random.PRNGKey(0)}, *inputs))
    params = init(jax.random.PRNGKey(seed))["params"]
    fwd = jax.jit(lambda p, *a: model.apply({"params": p}, *a))
    return model, params, fwd(params, *inputs)


@pytest.mark.parametrize("stage_kw", [
    dict(),
    dict(learn_skeleton=True),
    dict(learn_skeleton=True, attn_bias=True, use_bias_attn_module=True),
])
def test_forward_stages(stage_kw):
    cfg = _cfg(**stage_kw)
    inputs = _inputs()
    _, _, out = _run(cfg, inputs)
    assert out.outputs.shape == (3, 2, K, 2)
    assert np.isfinite(np.asarray(out.outputs)).all()
    assert (np.asarray(out.outputs) >= 0).all()
    assert (np.asarray(out.outputs) <= 1).all()
    assert out.encode.adj.shape == (2, 2, K, K)
    if stage_kw.get("learn_skeleton"):
        assert out.encode.hop_stack.shape == (2, K, K, cfg.max_hops + 1)


def test_invalid_keypoint_heatmaps_do_not_leak():
    """Perturbing the heatmaps of padded keypoints must not change valid
    outputs (pooled features are zeroed by the visibility mask)."""
    cfg = _cfg(learn_skeleton=True)
    feat_q, feat_s, tgt_s, mask, adj = _inputs()
    model, params, out1 = _run(cfg, (feat_q, feat_s, tgt_s, mask, adj))
    tgt_mod = np.asarray(tgt_s).copy()
    tgt_mod[0, :, 8:] = np.random.default_rng(9).uniform(
        size=tgt_mod[0, :, 8:].shape)
    fwd = jax.jit(lambda p, *a: model.apply({"params": p}, *a))
    out2 = fwd(params, feat_q, feat_s, jnp.asarray(tgt_mod), mask, adj)
    np.testing.assert_allclose(np.asarray(out1.outputs[:, 0, :8]),
                               np.asarray(out2.outputs[:, 0, :8]), atol=1e-5)


def test_batch_independence():
    """Each episode's outputs depend only on its own inputs."""
    cfg = _cfg()
    feat_q, feat_s, tgt_s, mask, adj = _inputs(batch=2)
    model, params, out = _run(cfg, (feat_q, feat_s, tgt_s, mask, adj))
    fwd = jax.jit(lambda p, *a: model.apply({"params": p}, *a))
    solo = fwd(params, feat_q[:1], feat_s[:1], tgt_s[:1], mask[:1], adj[:1])
    np.testing.assert_allclose(np.asarray(out.outputs[:, 0]),
                               np.asarray(solo.outputs[:, 0]), atol=1e-5)


def test_eval_deterministic():
    cfg = _cfg(learn_skeleton=True)
    inputs = _inputs()
    model, params, out1 = _run(cfg, inputs)
    fwd = jax.jit(lambda p, *a: model.apply({"params": p}, *a))
    out2 = fwd(params, *inputs)
    np.testing.assert_array_equal(np.asarray(out1.outputs),
                                  np.asarray(out2.outputs))


def test_zero_conv_makes_learned_adj_start_at_gt():
    """At init the zero-conv zeroes the predicted component: the learned
    adjacency must equal the GT-only adjacency (reference combine_adj +
    zero_module semantics)."""
    inputs = _inputs()
    _, _, out_gt = _run(_cfg(), inputs)
    _, _, out_learn = _run(_cfg(learn_skeleton=True), inputs)
    np.testing.assert_allclose(np.asarray(out_learn.encode.adj),
                               np.asarray(out_gt.encode.adj), atol=1e-6)


def test_five_shot_forward():
    cfg = _cfg()
    inputs = _inputs(shots=5)
    _, _, out = _run(cfg, inputs)
    assert out.outputs.shape == (3, 2, K, 2)
    assert np.isfinite(np.asarray(out.outputs)).all()


def test_all_padded_sample_is_finite():
    cfg = _cfg(learn_skeleton=True)
    feat_q, feat_s, tgt_s, mask, adj = _inputs()
    mask0 = jnp.asarray(np.zeros((2, K), np.float32))  # nothing visible
    _, _, out = _run(cfg, (feat_q, feat_s, tgt_s, mask0, adj))
    assert np.isfinite(np.asarray(out.outputs)).all()


def test_return_attn_maps():
    """decode(return_attn=True) yields per-layer head-averaged kp->image
    attention probabilities (reference return_attn_map,
    encoder_decoder.py:391-392): shape [L, B, K, HW], rows sum to 1, and
    the predictions are unchanged."""
    cfg = _cfg(learn_skeleton=True)
    inputs = _inputs()
    model, params, out = _run(cfg, inputs)
    enc = out.encode

    fwd = jax.jit(lambda p: model.apply(
        {"params": p}, enc.kp_tokens, enc.img_tokens, enc.proposals,
        enc.adj, enc.hop_stack, enc.kp_valid, enc.img_pos,
        return_attn=True, method=EdgeCape.decode))
    outputs, _, attn = fwd(params)
    assert attn.shape == (3, 2, K, G * G)
    a = np.asarray(attn)
    np.testing.assert_allclose(a.sum(axis=-1), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(outputs),
                               np.asarray(out.outputs), atol=1e-6)
