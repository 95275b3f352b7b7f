"""Executable-reference goldens: run the ACTUAL reference model code
(/root/reference/EdgeCape/models/keypoint_heads/{encoder_decoder,skeleton,
head}.py, imported via tests/reference_shim.py) on random weights, map the
torch state_dict through models/convert.py, and assert our flax head
produces the same outputs.

This is the strongest offline parity instrument: a shared misunderstanding
between our model and a hand-written test oracle cannot pass here, because
the oracle IS the reference source.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from edgecape_tpu.config import ModelConfig  # noqa: E402
from edgecape_tpu.models import convert  # noqa: E402
from edgecape_tpu.models.edgecape import init_model  # noqa: E402
from edgecape_tpu.ops import graph  # noqa: E402
from reference_shim import build_reference_head, load_reference  # noqa: E402

pytestmark = pytest.mark.slow  # heavy jit/model suite; excluded by -m 'not slow'

B, S, K, G, HM, CB = 2, 2, 8, 4, 16, 384

SKELETONS = [
    [[0, 1], [1, 2], [2, 3], [3, 4], [4, 5], [5, 6], [0, 7]],
    [[0, 1], [0, 2], [2, 3], [2, 4], [4, 5]],
]


def _random_skeletons(k: int, seed: int):
    """Per-sample plausible skeletons at arbitrary K: a chain plus random
    chords (matches the synthetic-dataset category generator's shape)."""
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(B):
        edges = [[i, i + 1] for i in range(k - 1)]
        for _ in range(max(1, k // 4)):
            i, j = map(int, rng.choice(k, size=2, replace=False))
            if [min(i, j), max(i, j)] not in edges:
                edges.append([min(i, j), max(i, j)])
        out.append(edges)
    return out


def _cfg(g=G, hm=HM, k=K, **kw):
    return ModelConfig(image_size=g * 14, heatmap_size=hm, max_kpt=k, **kw)


def _inputs(seed=0, *, s=S, k=K, g=G, hm=HM, skeletons=None):
    """Shared random episode; returns (torch-side dict, jax-side dict)."""
    skeletons = SKELETONS if skeletons is None else skeletons
    rng = np.random.default_rng(seed)
    feat_q = rng.normal(size=(B, CB, g, g)).astype(np.float32)
    feat_s = rng.normal(size=(s, B, CB, g, g)).astype(np.float32)
    # plausible heatmaps: nonnegative with sparse peaks
    target_s = np.clip(
        rng.normal(size=(s, B, k, hm, hm)), 0, None).astype(np.float32) ** 2
    mask = np.ones((B, k), np.float32)
    mask[0, 3 * k // 4:] = 0.0   # some invisible keypoints
    mask[1, 3] = 0.0
    target_s *= mask[None, :, :, None, None]

    t = {
        "feature_q": torch.from_numpy(feat_q),
        "feature_s": [torch.from_numpy(f) for f in feat_s],
        "target_s": [torch.from_numpy(t_) for t_ in target_s],
        "mask_s": torch.from_numpy(mask)[..., None],
        "skeleton": skeletons,
    }
    binary_adj = np.stack([
        graph.adjacency_from_edges(sk, k) for sk in skeletons])
    j = {
        "feat_q": jnp.asarray(feat_q.transpose(0, 2, 3, 1)),
        "feat_s": jnp.asarray(feat_s.transpose(1, 0, 3, 4, 2)),
        "target_s": jnp.asarray(target_s.transpose(1, 0, 2, 3, 4)),
        "mask_s": jnp.asarray(mask),
        "binary_adj": jnp.asarray(binary_adj),
    }
    return t, j


def _ours(cfg, sd, j, *, shots=S):
    model, params0 = init_model(__import__("jax").random.PRNGKey(0), cfg,
                                batch=B, shots=shots)
    params = convert.convert_head(sd, cfg)
    # structural check: every param our model creates must be supplied by
    # the converter. (The converse doesn't hold at stage 1: the reference
    # materializes skeleton-refiner modules even when learn_skeleton=False,
    # so the converted tree may carry extras flax never reads.)
    flat0 = {"/".join(p) for p, _ in _flatten(params0)}
    flatc = {"/".join(p) for p, _ in _flatten(params)}
    assert flat0 <= flatc, sorted(flat0 - flatc)[:10]
    out = model.apply({"params": params}, j["feat_q"], j["feat_s"],
                      j["target_s"], j["mask_s"], j["binary_adj"],
                      train=False)
    return out


def _flatten(tree, path=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flatten(v, path + (k,))
    else:
        yield path, tree


def _run_reference(ref_head, t):
    with torch.no_grad():
        outputs, initial_proposals, similarity_map, recon, adj = ref_head(
            t["feature_q"], t["feature_s"], t["target_s"], t["mask_s"],
            t["skeleton"])
    return (outputs.numpy(), initial_proposals.numpy(),
            similarity_map.numpy(), adj.numpy())


@pytest.mark.parametrize("stage", ["base", "skeleton_bias"])
def test_full_head_forward_matches_reference(stage):
    """Full TwoStageHead.forward parity: encoder, proposal generator,
    skeleton predictor, decoder w/ GCN-FFN (+Markov bias at stage 3), and
    the per-layer kpt-branch recompute — reference code as the oracle."""
    learn = stage == "skeleton_bias"
    cfg = _cfg(learn_skeleton=learn, attn_bias=learn,
               use_bias_attn_module=learn)
    ref_head, sd = build_reference_head(cfg, learn_skeleton=learn,
                                        attn_bias=learn, seed=7)
    t, j = _inputs(seed=3)
    ref_out, ref_prop, ref_sim, ref_adj = _run_reference(ref_head, t)

    out = _ours(cfg, sd, j)
    got_out = np.asarray(out.outputs)
    got_prop = np.asarray(out.encode.proposals_for_loss)
    got_sim = np.asarray(out.encode.similarity)
    got_adj = np.asarray(out.encode.adj)

    np.testing.assert_allclose(got_sim, ref_sim, atol=2e-3, rtol=1e-4)
    np.testing.assert_allclose(got_prop, ref_prop, atol=1e-4)
    np.testing.assert_allclose(got_adj, ref_adj, atol=1e-4)
    np.testing.assert_allclose(got_out, ref_out, atol=5e-4)


def test_sine_coordinate_embedding_matches_reference():
    """ops/pos_enc.sine_coords vs the reference SinePositionalEncoding
    .forward_coordinates (positional_encoding.py:96-123)."""
    from edgecape_tpu.ops import pos_enc
    ref = load_reference()
    pe = ref.SinePositionalEncoding(num_feats=128, normalize=True)
    coords = np.random.default_rng(0).uniform(0, 1, (B, K, 2)).astype(
        np.float32)
    want = pe.forward_coordinates(torch.from_numpy(coords)).numpy()
    got = np.asarray(pos_enc.sine_coords(jnp.asarray(coords), 128))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_sine_grid_matches_reference():
    """ops/pos_enc.sine_grid vs the reference SinePositionalEncoding
    .forward (mask-cumsum form)."""
    from edgecape_tpu.ops import pos_enc
    ref = load_reference()
    pe = ref.SinePositionalEncoding(num_feats=128, normalize=True)
    mask = torch.zeros((1, G, G), dtype=torch.bool)
    want = pe(mask).numpy()[0].transpose(1, 2, 0)          # [gh, gw, C]
    got = np.asarray(pos_enc.sine_grid(G, G, 128))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_get_loss_matches_reference():
    """Loss parity: reference TwoStageHead.get_loss (head.py:224-295) vs
    ops in models/head.py, on the same synthetic predictions."""
    from edgecape_tpu.models.head import keypoint_losses

    cfg = _cfg(learn_skeleton=True, with_heatmap_loss=True)
    ref_head, _ = build_reference_head(cfg, learn_skeleton=True, seed=2)
    ref_head.learn_skeleton = True
    ref_head.with_heatmap_loss = True

    rng = np.random.default_rng(9)
    L, H = 3, G
    output = rng.uniform(0, 1, (L, B, K, 2)).astype(np.float32)
    proposals = rng.uniform(0, 1, (B, K, 2)).astype(np.float32)
    sim = rng.normal(size=(B, K, H, H)).astype(np.float32)
    target_abs = rng.uniform(0, 224, (B, K, 2)).astype(np.float32)
    target_hm = np.clip(rng.normal(size=(B, K, HM, HM)), 0,
                        None).astype(np.float32)
    weight = np.ones((B, K, 1), np.float32)
    weight[0, 5:] = 0.0
    sizes = np.full((B, 1, 2), 224.0, np.float32)
    recon = rng.uniform(0, 1, (B, K, 2)).astype(np.float32)

    want = ref_head.get_loss(
        torch.from_numpy(output), torch.from_numpy(proposals),
        torch.from_numpy(sim), torch.from_numpy(target_abs),
        torch.from_numpy(target_hm), torch.from_numpy(weight),
        torch.from_numpy(sizes), torch.from_numpy(recon))

    got = keypoint_losses(
        jnp.asarray(output), jnp.asarray(target_abs / 224.0),
        jnp.asarray(weight[..., 0]),
        proposals_for_loss=jnp.asarray(proposals),
        recon=jnp.asarray(recon), skeleton_loss_weight=1.0,
        similarity=jnp.asarray(sim), target_heatmap=jnp.asarray(target_hm),
        with_heatmap_loss=True, heatmap_loss_weight=2.0)

    for name in ("adj_reconstruct_loss", "proposal_loss", "heatmap_loss",
                 "l1_loss_layer0", "l1_loss_layer1", "l1_loss_layer2"):
        np.testing.assert_allclose(float(got[name]),
                                   float(want[name]), rtol=1e-5,
                                   err_msg=name)


def test_masked_reconstruction_branch_matches_reference():
    """Stage-2 masked-supervision branch: the reference decoder re-run on
    mask-token-substituted keypoint tokens (encoder_decoder.py:212-237) vs
    our mask_tokens + decode composition."""
    import jax

    cfg = _cfg(learn_skeleton=True, attn_bias=False,
               masked_supervision=True)
    ref_head, sd = build_reference_head(cfg, learn_skeleton=True,
                                        attn_bias=False,
                                        masked_supervision=True, seed=11)
    t, j = _inputs(seed=5)

    rand_mask = np.ones((B, K), np.float32)
    rand_mask[:, 1] = 0.0
    rand_mask[0, 4] = 0.0

    # reference: masked branch only runs in train mode; put the dropout
    # modules in eval while keeping module.training True for the decoder
    # gate (mirrors what an eval-style golden needs)
    ref_head.train()
    for m in ref_head.modules():
        if isinstance(m, torch.nn.Dropout):
            m.eval()
        if m.__class__.__name__ == "FairseqDropout":
            m.eval()
    with torch.no_grad():
        _, _, _, recon, _ = ref_head(
            t["feature_q"], t["feature_s"], t["target_s"], t["mask_s"],
            t["skeleton"], random_mask=torch.from_numpy(rand_mask)[..., None])
    ref_head.eval()

    model, _ = init_model(jax.random.PRNGKey(0), cfg, batch=B, shots=S)
    params = convert.convert_head(sd, cfg)

    def recon_fn(params):
        def inner(mdl):
            enc = mdl.encode(j["feat_q"], j["feat_s"], j["target_s"],
                             j["mask_s"], j["binary_adj"], train=False)
            masked = mdl.mask_tokens(enc.kp_tokens, jnp.asarray(rand_mask),
                                     enc.kp_valid)
            _, points = mdl.decode(masked, enc.img_tokens, enc.proposals,
                                   enc.adj, enc.hop_stack, enc.kp_valid,
                                   enc.img_pos, train=False)
            return points[-1]
        return model.apply({"params": params}, method=lambda m: inner(m))

    got = np.asarray(recon_fn(params))
    np.testing.assert_allclose(got, recon.numpy(), atol=5e-4)


# ---------------------------------------------------------- production shapes
# The shipped recipe runs K=100, a 16x16 feature grid (256 image tokens +
# 100 kpt tokens = 356-token encoder), 64px heatmaps, S in {1, 5}
# (configs/test/1shot_split1.py data_cfg). These exercise padding/masking
# paths the tiny default shapes never see (reference encoder_decoder.py
# 356-token concat, mask handling at 100 kpt slots).
PROD_K, PROD_G, PROD_HM = 100, 16, 64


@pytest.mark.parametrize("shots", [1, 5])
def test_full_head_production_shapes_matches_reference(shots):
    """Full forward parity at the production regime (skeleton+bias stage,
    the full-machinery configuration)."""
    cfg = _cfg(g=PROD_G, hm=PROD_HM, k=PROD_K, learn_skeleton=True,
               attn_bias=True, use_bias_attn_module=True)
    ref_head, sd = build_reference_head(cfg, learn_skeleton=True,
                                        attn_bias=True, seed=13)
    sks = _random_skeletons(PROD_K, seed=21)
    t, j = _inputs(seed=17, s=shots, k=PROD_K, g=PROD_G, hm=PROD_HM,
                   skeletons=sks)
    ref_out, ref_prop, ref_sim, ref_adj = _run_reference(ref_head, t)

    out = _ours(cfg, sd, j, shots=shots)
    np.testing.assert_allclose(np.asarray(out.encode.similarity), ref_sim,
                               atol=2e-3, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out.encode.proposals_for_loss),
                               ref_prop, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.encode.adj), ref_adj,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.outputs), ref_out, atol=1e-3)


def test_masked_branch_production_shapes_matches_reference():
    """Stage-2 masked-reconstruction branch at production shapes
    (encoder_decoder.py:212-237 semantics at the 356-token regime)."""
    import jax

    cfg = _cfg(g=PROD_G, hm=PROD_HM, k=PROD_K, learn_skeleton=True,
               attn_bias=False, masked_supervision=True)
    ref_head, sd = build_reference_head(cfg, learn_skeleton=True,
                                        attn_bias=False,
                                        masked_supervision=True, seed=19)
    sks = _random_skeletons(PROD_K, seed=23)
    t, j = _inputs(seed=29, s=1, k=PROD_K, g=PROD_G, hm=PROD_HM,
                   skeletons=sks)

    rng = np.random.default_rng(31)
    rand_mask = np.ones((B, PROD_K), np.float32)
    rand_mask[:, rng.choice(PROD_K, size=PROD_K // 2, replace=False)] = 0.0

    ref_head.train()
    for m in ref_head.modules():
        if isinstance(m, torch.nn.Dropout):
            m.eval()
        if m.__class__.__name__ == "FairseqDropout":
            m.eval()

    def run_ref(fq):
        with torch.no_grad():
            _, _, _, r, _ = ref_head(
                fq, t["feature_s"], t["target_s"], t["mask_s"],
                t["skeleton"],
                random_mask=torch.from_numpy(rand_mask)[..., None])
        return r.numpy()

    recon = run_ref(t["feature_q"])
    # The masked 3-layer sigmoid-refinement chain at random-weight
    # production shapes is chaotically ill-conditioned: the reference's
    # OWN output moves ~0.06 under a 1e-6 input perturbation (measured
    # here), so a fixed small atol would reject every correct
    # reimplementation. Calibrate the tolerance to the measured
    # sensitivity instead; the tight semantic oracle for this branch is
    # test_masked_reconstruction_branch_matches_reference above.
    torch.manual_seed(0)
    pert = run_ref(t["feature_q"]
                   + 1e-6 * torch.randn_like(t["feature_q"]))
    sens = float(np.abs(recon - pert).max())
    ref_head.eval()

    model, _ = init_model(jax.random.PRNGKey(0), cfg, batch=B, shots=1)
    params = convert.convert_head(sd, cfg)

    def inner(mdl):
        enc = mdl.encode(j["feat_q"], j["feat_s"], j["target_s"],
                         j["mask_s"], j["binary_adj"], train=False)
        masked = mdl.mask_tokens(enc.kp_tokens, jnp.asarray(rand_mask),
                                 enc.kp_valid)
        _, points = mdl.decode(masked, enc.img_tokens, enc.proposals,
                               enc.adj, enc.hop_stack, enc.kp_valid,
                               enc.img_pos, train=False)
        return points[-1]

    got = np.asarray(model.apply({"params": params},
                                 method=lambda m: inner(m)))
    atol = max(1e-3, 3.0 * sens)
    np.testing.assert_allclose(got, recon, atol=atol)
    # guard against the calibration masking a gross semantic break
    assert sens < 0.2, f"conditioning collapsed entirely (sens={sens})"


def test_bf16_head_production_tolerance():
    """bf16 head at production shapes vs the fp32 reference: documents the
    achievable coordinate tolerance. Measured on normalized [0, 1] coords:
    median |err| ~1e-5 (near-exact), but where the similarity map has a
    near-tie, bf16 rounding shifts the soft-argmax proposal by one feature
    cell (1/16 = 0.0625) and the decoder's sigmoid refinement carries the
    offset through — so the error distribution is bimodal {~0, ~1 cell}.
    Random weights make similarity near-uniform, so ties (and jumps) are
    FAR more frequent here than with trained weights (the fused-kernel
    eval tests bound the trained-behavior jump rate at <5%)."""
    import jax

    cfg = _cfg(g=PROD_G, hm=PROD_HM, k=PROD_K, learn_skeleton=True,
               attn_bias=True, use_bias_attn_module=True)
    ref_head, sd = build_reference_head(cfg, learn_skeleton=True,
                                        attn_bias=True, seed=13)
    sks = _random_skeletons(PROD_K, seed=21)
    t, j = _inputs(seed=17, s=1, k=PROD_K, g=PROD_G, hm=PROD_HM,
                   skeletons=sks)
    ref_out, _, _, _ = _run_reference(ref_head, t)

    model, _ = init_model(jax.random.PRNGKey(0), cfg, batch=B, shots=1)
    params = convert.convert_head(sd, cfg)
    to_bf16 = lambda x: (x.astype(jnp.bfloat16)  # noqa: E731
                         if x.dtype == jnp.float32 else x)
    params16 = jax.tree.map(to_bf16, params)
    j16 = {kk: to_bf16(v) for kk, v in j.items()}
    out = model.apply({"params": params16}, j16["feat_q"], j16["feat_s"],
                      j16["target_s"], j16["mask_s"], j16["binary_adj"],
                      train=False)
    got = np.asarray(out.outputs, np.float32)
    err = np.abs(got - ref_out)
    med = float(np.median(err))
    mx = float(err.max())
    cell = 1.0 / PROD_G
    assert med < 1e-3, f"bf16 median error {med:.5f}"
    assert mx < 1.5 * cell, (f"bf16 max error {mx:.4f} exceeds one "
                             f"feature-cell jump ({cell:.4f})")
