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


def _randomize_kpt_out(params, seed=7, scale=0.02):
    """KptBranch final layers are zero-init (reference TokenDecodeMLP),
    which makes the decoder an identity on coordinates at init — any
    two decoder implementations then agree on outputs/points trivially.
    Give the delta heads small random weights so the trajectory, the
    sine/ref_point_head re-embedding, and the head recompute actually
    discriminate."""
    try:
        from flax.core import unfreeze
        params = unfreeze(params)
    except Exception:
        pass
    rng = np.random.default_rng(seed)
    dec = params["decoder"]
    for name, sub in dec.items():
        if name.startswith("kpt_branch"):
            k = sub["out"]["kernel"]
            sub["out"]["kernel"] = jnp.asarray(
                rng.normal(size=k.shape) * scale, k.dtype)
            b = sub["out"]["bias"]
            sub["out"]["bias"] = jnp.asarray(
                rng.normal(size=b.shape) * scale, b.dtype)
    return params


@pytest.mark.parametrize("stage_kw", [
    dict(),
    dict(learn_skeleton=True, attn_bias=True, use_bias_attn_module=True),
])
def test_fused_decoder_matches_flax(stage_kw):
    """Decoder-isolated parity: the SAME encoder outputs pushed through
    the fused Pallas decoder (interpreter off-TPU) vs the flax decoder,
    same params — including the Markov-biased self-attention at stage 3."""
    cfg, params, inputs = _setup(**stage_kw)
    params = _randomize_kpt_out(params)
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


@pytest.mark.parametrize("stage_kw", [
    dict(),
    dict(learn_skeleton=True, attn_bias=True, use_bias_attn_module=True),
])
def test_decoder_stack_matches_flax(stage_kw):
    """Whole-decoder-in-Pallas (chunked stack with in-kernel glue:
    bias MLP, sine+ref_point_head, kpt_branch, trajectory) vs the flax
    decoder on the same encoder outputs. d_model 256 makes the default
    8 MB chunk budget split 3 layers into 2+1, so the chunk-boundary
    carry is exercised here too."""
    from edgecape_tpu.ops import pallas_config
    cfg, params, inputs = _setup(**stage_kw)
    params = _randomize_kpt_out(params)
    plain = _full(cfg, params, inputs)
    enc = plain.encode

    fused_model = EdgeCape(dataclasses.replace(cfg, use_flash=True))
    pallas_config.set_decoder_stack(True)
    try:
        outs, points = fused_model.apply(
            {"params": params}, enc.kp_tokens, enc.img_tokens,
            enc.proposals, enc.adj, enc.hop_stack, enc.kp_valid,
            enc.img_pos, method=EdgeCape.decode)
    finally:
        pallas_config.set_decoder_stack(None)

    mask = np.asarray(inputs[3]) > 0                      # [B, K]
    p, f = np.asarray(plain.outputs), np.asarray(outs)
    d = np.abs(p - f)[:, mask]
    assert np.median(d) < 2e-3, np.median(d)
    assert np.quantile(d, 0.95) < 0.01, np.quantile(d, 0.95)
    # trajectory contract: list of [initial, after L0, ...], fp32
    assert len(points) == cfg.num_decoder_layers + 1
    np.testing.assert_allclose(np.asarray(points[0]),
                               np.asarray(plain.points[0]), atol=1e-6)
    dp = np.abs(np.asarray(points[-1]) - np.asarray(plain.points[-1]))
    assert np.median(dp[mask]) < 2e-3, np.median(dp[mask])


def test_decoder_stack_matches_chained_fused():
    """Stack vs the per-layer fused chain (both Pallas interpret): the
    only numeric deltas are the in-kernel glue (bf16 fc weights,
    polynomial erf), so agreement is tighter than vs flax."""
    from edgecape_tpu.ops import pallas_config
    cfg, params, inputs = _setup(learn_skeleton=True, attn_bias=True,
                                 use_bias_attn_module=True)
    params = _randomize_kpt_out(params)
    plain = _full(cfg, params, inputs)
    enc = plain.encode
    fused_model = EdgeCape(dataclasses.replace(cfg, use_flash=True))
    args = (enc.kp_tokens, enc.img_tokens, enc.proposals, enc.adj,
            enc.hop_stack, enc.kp_valid, enc.img_pos)
    chain, chain_pts = fused_model.apply({"params": params}, *args,
                                         method=EdgeCape.decode)
    pallas_config.set_decoder_stack(True)
    try:
        stack, stack_pts = fused_model.apply({"params": params}, *args,
                                             method=EdgeCape.decode)
    finally:
        pallas_config.set_decoder_stack(None)
    mask = np.asarray(inputs[3]) > 0
    d = np.abs(np.asarray(chain) - np.asarray(stack))[:, mask]
    # tripwire: the stack is a different implementation (bf16 glue
    # weights, polynomial erf) — bit-equality would mean the gate never
    # dispatched to it
    assert d.max() > 0.0
    assert np.median(d) < 1e-3, np.median(d)
    assert np.quantile(d, 0.95) < 5e-3, np.quantile(d, 0.95)
    dp = np.abs(np.asarray(chain_pts[-1]) - np.asarray(stack_pts[-1]))
    assert np.median(dp[mask]) < 1e-3, np.median(dp[mask])


def test_decoder_stack_single_chunk_path():
    """Force one-layer chunks (tiny max_chunk_bytes) and compare against
    the default chunking — the chunk-boundary HBM carry must be
    value-preserving."""
    from edgecape_tpu.models.transformer import ensure_some_valid
    from edgecape_tpu.ops.fused_decoder import fused_decoder_stack
    cfg, params, inputs = _setup(learn_skeleton=True, attn_bias=True,
                                 use_bias_attn_module=True)
    params = _randomize_kpt_out(params)
    plain = _full(cfg, params, inputs)
    enc = plain.encode
    p = params["decoder"]
    layer_params = tuple(
        {"dec": p[f"layer{i}"], "kpt": p[f"kpt_branch{i}"],
         "bias_mlp": p[f"layer{i}"]["bias_mlp"]}
        for i in range(cfg.num_decoder_layers))
    kp_valid = ensure_some_valid(enc.kp_valid)
    common = (enc.kp_tokens, enc.proposals.astype(jnp.float32),
              enc.img_tokens, enc.img_pos[0], kp_valid, enc.hop_stack,
              enc.adj, layer_params, p["ref_point_head"], p["norm"])
    kw = dict(num_heads=cfg.nhead, num_feats=cfg.num_feats,
              interpret=True)
    o_def, pts_def = fused_decoder_stack(*common, **kw)
    o_one, pts_one = fused_decoder_stack(*common, max_chunk_bytes=1,
                                         **kw)
    np.testing.assert_allclose(np.asarray(o_def), np.asarray(o_one),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(pts_def), np.asarray(pts_one),
                               atol=1e-5, rtol=1e-5)


def test_decoder_stack_row_grouping_consistent():
    """Multi-row programs (group>1, picked at b=4) must produce exactly
    the same per-row results as b=1 runs — catches block-indexing bugs
    in the row loop that b=3 (group=1) tests can't see."""
    from edgecape_tpu.models.transformer import ensure_some_valid
    from edgecape_tpu.ops.fused_decoder import fused_decoder_stack
    cfg, params, _ = _setup(learn_skeleton=True, attn_bias=True,
                            use_bias_attn_module=True)
    params = _randomize_kpt_out(params)
    p = params["decoder"]
    layer_params = tuple(
        {"dec": p[f"layer{i}"], "kpt": p[f"kpt_branch{i}"],
         "bias_mlp": p[f"layer{i}"]["bias_mlp"]}
        for i in range(cfg.num_decoder_layers))

    b, k, hw, c = 4, K, 16, cfg.d_model
    rng = np.random.default_rng(3)
    kp_tokens = jnp.asarray(rng.normal(size=(b, k, c)) * 0.2, jnp.float32)
    img_tokens = jnp.asarray(rng.normal(size=(b, hw, c)) * 0.2,
                             jnp.float32)
    proposals = jnp.asarray(rng.uniform(0.1, 0.9, size=(b, k, 2)),
                            jnp.float32)
    adj = jnp.asarray(rng.uniform(0, 0.5, size=(b, 2, k, k)), jnp.float32)
    hops = jnp.asarray(rng.uniform(0, 1, size=(b, k, k, 5)), jnp.float32)
    valid = np.ones((b, k), bool)
    valid[1, 8:] = False
    kp_valid = ensure_some_valid(jnp.asarray(valid))
    img_pos = jnp.asarray(rng.normal(size=(hw, c)) * 0.5, jnp.float32)

    kw = dict(num_heads=cfg.nhead, num_feats=cfg.num_feats,
              interpret=True)
    o4, p4 = fused_decoder_stack(kp_tokens, proposals, img_tokens,
                                 img_pos, kp_valid, hops, adj,
                                 layer_params, p["ref_point_head"],
                                 p["norm"], **kw)
    for i in range(b):
        o1, p1 = fused_decoder_stack(
            kp_tokens[i:i + 1], proposals[i:i + 1],
            img_tokens[i:i + 1], img_pos, kp_valid[i:i + 1],
            hops[i:i + 1], adj[i:i + 1], layer_params,
            p["ref_point_head"], p["norm"], **kw)
        np.testing.assert_array_equal(np.asarray(o4[:, i]),
                                      np.asarray(o1[:, 0]))
        np.testing.assert_array_equal(np.asarray(p4[:, i]),
                                      np.asarray(p1[:, 0]))


@pytest.mark.slow  # production-width interpret run: a few minutes of jit
def test_decoder_stack_production_width_bf16():
    """The one dimension class the toy tests miss: production
    cross-attention width (HW=256 image tokens, K=100 -> Kp=128) with
    bf16 tokens (the head_dtype the bench runs) and batch 4 (row
    group 2). Stack vs the per-layer fused chain, trajectory compared."""
    from edgecape_tpu.models.transformer import Decoder
    from edgecape_tpu.ops import pallas_config

    b, k, hw, c, f = 4, 100, 256, 256, 384
    dec = Decoder(d_model=c, nhead=8, dim_feedforward=f, num_layers=3,
                  dropout=0.0, attn_bias=True, max_hops=4,
                  num_feats=c // 2, use_flash=True)
    rng = np.random.default_rng(17)
    kp_tokens = jnp.asarray(rng.normal(size=(b, k, c)) * 0.2,
                            jnp.bfloat16)
    img_tokens = jnp.asarray(rng.normal(size=(b, hw, c)) * 0.2,
                             jnp.bfloat16)
    img_pos = jnp.asarray(rng.normal(size=(1, hw, c)) * 0.5, jnp.float32)
    proposals = jnp.asarray(rng.uniform(0.1, 0.9, size=(b, k, 2)),
                            jnp.float32)
    adj = jnp.asarray(rng.uniform(0, 0.4, size=(b, 2, k, k)), jnp.float32)
    hops = jnp.asarray(rng.uniform(0, 1, size=(b, k, k, 5)), jnp.float32)
    valid = np.ones((b, k), bool)
    valid[0, 64:] = False
    kp_valid = jnp.asarray(valid)

    params = dec.init(
        {"params": jax.random.PRNGKey(0)},
        kp_tokens[:1], img_tokens[:1], kp_valid=kp_valid[:1],
        img_pos=img_pos, initial_proposals=proposals[:1], adj=adj[:1],
        hop_stack=hops[:1])["params"]
    params = _randomize_kpt_out({"decoder": params})["decoder"]

    common = dict(kp_valid=kp_valid, img_pos=img_pos,
                  initial_proposals=proposals, adj=adj, hop_stack=hops)
    _, chain_pts = dec.apply({"params": params}, kp_tokens, img_tokens,
                             **common)
    pallas_config.set_decoder_stack(True)
    try:
        _, stack_pts = dec.apply({"params": params}, kp_tokens,
                                 img_tokens, method=Decoder.decode_stacked,
                                 **common)
    finally:
        pallas_config.set_decoder_stack(None)
    m = np.asarray(valid)
    d = np.abs(np.asarray(chain_pts[-1]) - np.asarray(stack_pts[-1]))[m]
    assert d.max() > 0.0          # different implementation actually ran
    assert np.median(d) < 2e-3, np.median(d)
    assert np.quantile(d, 0.95) < 0.01, np.quantile(d, 0.95)
