"""Independent-oracle golden for the DINOv2 backbone.

The reference loads facebookresearch/dinov2 via torch.hub (reference
EdgeCape/models/detectors/EdgeCape.py:36) whose source is NOT in
/root/reference — the existing golden (tests/test_reference_golden.py)
compares against an in-test torch reimplementation, which the round-3
verdict flagged as residual risk. transformers' Dinov2Model is a third,
INDEPENDENTLY-written implementation of the same architecture (HF's
port of the dinov2 repo), available offline; matching it and the flax
DinoViT through the hub-format converter rules out a shared
transcription error.

Position-embedding interpolation is deliberately sidestepped (the HF
port interpolates with size= where the hub code uses the offset-0.1
scale_factor hack, a real upstream numerics difference): the HF model
is built NATIVE at the test resolution, so neither side interpolates.
The hub-exact interpolation itself is covered by
test_reference_golden.py's resize_pos_embed goldens.
"""

import dataclasses

import numpy as np
import pytest

import jax

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from edgecape_tpu.models import dinov2


def _hf_to_hub_state_dict(model) -> dict:
    """transformers Dinov2Model.state_dict() -> torch-hub dinov2 naming
    (the format convert_torch_state_dict consumes): q/k/v fused back to
    one qkv projection, HF module paths renamed."""
    sd = {k: v.detach().clone() for k, v in model.state_dict().items()}
    out = {
        "cls_token": sd["embeddings.cls_token"],
        "mask_token": sd["embeddings.mask_token"],
        "pos_embed": sd["embeddings.position_embeddings"],
        "patch_embed.proj.weight":
            sd["embeddings.patch_embeddings.projection.weight"],
        "patch_embed.proj.bias":
            sd["embeddings.patch_embeddings.projection.bias"],
        "norm.weight": sd["layernorm.weight"],
        "norm.bias": sd["layernorm.bias"],
    }
    n_layers = model.config.num_hidden_layers
    for i in range(n_layers):
        hf = f"encoder.layer.{i}."
        hub = f"blocks.{i}."
        att = hf + "attention.attention."
        out[hub + "attn.qkv.weight"] = torch.cat(
            [sd[att + "query.weight"], sd[att + "key.weight"],
             sd[att + "value.weight"]], dim=0)
        out[hub + "attn.qkv.bias"] = torch.cat(
            [sd[att + "query.bias"], sd[att + "key.bias"],
             sd[att + "value.bias"]], dim=0)
        out[hub + "attn.proj.weight"] = sd[hf + "attention.output.dense.weight"]
        out[hub + "attn.proj.bias"] = sd[hf + "attention.output.dense.bias"]
        for src, dst in (("norm1", "norm1"), ("norm2", "norm2")):
            out[hub + dst + ".weight"] = sd[hf + src + ".weight"]
            out[hub + dst + ".bias"] = sd[hf + src + ".bias"]
        out[hub + "ls1.gamma"] = sd[hf + "layer_scale1.lambda1"]
        out[hub + "ls2.gamma"] = sd[hf + "layer_scale2.lambda1"]
        out[hub + "mlp.fc1.weight"] = sd[hf + "mlp.fc1.weight"]
        out[hub + "mlp.fc1.bias"] = sd[hf + "mlp.fc1.bias"]
        out[hub + "mlp.fc2.weight"] = sd[hf + "mlp.fc2.weight"]
        out[hub + "mlp.fc2.bias"] = sd[hf + "mlp.fc2.bias"]
    return out


def _build_pair(image_size, hidden, layers, heads, seed):
    """(HF model, flax params, matching DinoV2Config) with shared random
    weights, HF model native at image_size (no pos interpolation)."""
    from transformers import Dinov2Config, Dinov2Model

    torch.manual_seed(seed)
    hf_cfg = Dinov2Config(
        hidden_size=hidden, num_hidden_layers=layers,
        num_attention_heads=heads, mlp_ratio=4, patch_size=14,
        image_size=image_size, layerscale_value=1e-5,
        layer_norm_eps=1e-6, hidden_act="gelu", use_swiglu_ffn=False,
        attention_probs_dropout_prob=0.0, hidden_dropout_prob=0.0)
    hf = Dinov2Model(hf_cfg).eval()
    # default init leaves layer_scale at 1e-5 which collapses every block
    # to near-identity; randomize all weights so a block-wiring bug can't
    # hide under the residual
    with torch.no_grad():
        for p in hf.parameters():
            p.copy_(torch.randn_like(p) * 0.02)
    grid = image_size // 14
    cfg = dataclasses.replace(
        dinov2.VIT_S14, embed_dim=hidden, depth=layers, num_heads=heads,
        pretrain_grid=grid)   # native grid: converter does not resize
    params = dinov2.convert_torch_state_dict(
        _hf_to_hub_state_dict(hf), image_size=image_size, cfg=cfg)
    return hf, params, cfg


def _compare(image_size, hidden, layers, heads, seed, batch=2,
             atol=2e-4):
    hf, params, cfg = _build_pair(image_size, hidden, layers, heads, seed)
    rng = np.random.default_rng(seed)
    imgs = rng.normal(size=(batch, image_size, image_size, 3)).astype(
        np.float32)
    with torch.no_grad():
        hf_out = hf(torch.from_numpy(imgs.transpose(0, 3, 1, 2))
                    ).last_hidden_state.numpy()
    grid = image_size // 14
    hf_feats = hf_out[:, 1:, :].reshape(batch, grid, grid, hidden)

    feats = np.asarray(dinov2.extract_features(
        params, jax.numpy.asarray(imgs), cfg=cfg, use_flash=False))
    np.testing.assert_allclose(feats, hf_feats, atol=atol, rtol=1e-3)


def test_dinov2_matches_transformers_tiny():
    _compare(image_size=56, hidden=64, layers=3, heads=2, seed=0)


@pytest.mark.slow
def test_dinov2_matches_transformers_vit_s14():
    """Full ViT-S/14 at 224px — the production backbone shape."""
    _compare(image_size=224, hidden=384, layers=12, heads=6, seed=1,
             atol=5e-4)
