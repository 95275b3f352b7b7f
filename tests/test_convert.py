"""Round-trip test for the reference-checkpoint converter: serialize our
param tree into the reference's torch state_dict naming (independent
inverse mapping written here), run models.convert over it, and require the
original tree back exactly — catching key-path, transpose, and split/fuse
errors."""

import numpy as np
import pytest

import jax

from edgecape_tpu.config import ModelConfig
from edgecape_tpu.models.convert import convert_head
from edgecape_tpu.models.edgecape import init_model

pytestmark = pytest.mark.slow  # heavy jit/model suite; excluded by -m 'not slow'


def _lin(sd, prefix, p):
    sd[prefix + ".weight"] = np.asarray(p["kernel"]).T
    sd[prefix + ".bias"] = np.asarray(p["bias"])


def _ln(sd, prefix, p):
    sd[prefix + ".weight"] = np.asarray(p["scale"])
    sd[prefix + ".bias"] = np.asarray(p["bias"])


def _conv1x1(sd, prefix, p, conv1d=False):
    w = np.asarray(p["kernel"]).T  # [out, in]
    sd[prefix + ".weight"] = w[..., None] if conv1d \
        else w[..., None, None]
    sd[prefix + ".bias"] = np.asarray(p["bias"])


def _mha_fused(sd, prefix, p):
    qw = np.asarray(p["q_proj"]["kernel"]).T
    kw = np.asarray(p["k_proj"]["kernel"]).T
    vw = np.asarray(p["v_proj"]["kernel"]).T
    sd[prefix + ".in_proj_weight"] = np.concatenate([qw, kw, vw], 0)
    sd[prefix + ".in_proj_bias"] = np.concatenate(
        [np.asarray(p[k]["bias"]) for k in ["q_proj", "k_proj", "v_proj"]])
    _lin(sd, prefix + ".out_proj", p["out_proj"])


def _mha_separate(sd, prefix, p):
    sd[prefix + ".q_proj_weight"] = np.asarray(p["q_proj"]["kernel"]).T
    sd[prefix + ".k_proj_weight"] = np.asarray(p["k_proj"]["kernel"]).T
    sd[prefix + ".v_proj_weight"] = np.asarray(p["v_proj"]["kernel"]).T
    sd[prefix + ".in_proj_bias"] = np.concatenate(
        [np.asarray(p[k]["bias"]) for k in ["q_proj", "k_proj", "v_proj"]])
    _lin(sd, prefix + ".out_proj", p["out_proj"])


def _mha_fairseq(sd, prefix, p):
    for k in ["q_proj", "k_proj", "v_proj"]:
        _lin(sd, f"{prefix}.{k}", p[k])
    _lin(sd, prefix + ".out_proj", p["out_proj"])


def _decoder_layer(sd, prefix, p, *, two_way, fairseq_self):
    if fairseq_self:
        _mha_fairseq(sd, prefix + "self_attn", p["self_attn"])
    else:
        _mha_fused(sd, prefix + "self_attn", p["self_attn"])
    _mha_separate(sd, prefix + "multihead_attn", p["cross_attn"])
    _lin(sd, prefix + "choker", p["choker"])
    _conv1x1(sd, prefix + "ffn1.conv", p["gcn"]["conv"], conv1d=True)
    _lin(sd, prefix + "ffn2", p["ffn2"])
    for n in ["norm1", "norm2", "norm3"]:
        _ln(sd, prefix + n, p[n])
    if two_way:
        _mha_separate(sd, prefix + "cross_attn_image_to_token",
                      p["two_way_attn"])
        _lin(sd, prefix + "cross_attn_image_to_token_choker",
             p["two_way_choker"])
        _ln(sd, prefix + "norm4", p["norm4"])
    if "bias_mlp" in p:
        _lin(sd, prefix + "self_attn.markov_structural_mlp.0",
             p["bias_mlp"]["fc1"])
        _lin(sd, prefix + "self_attn.markov_structural_mlp.3",
             p["bias_mlp"]["fc2"])


def _to_reference_sd(params, cfg):
    sd = {}
    kh = "keypoint_head_module."
    t = kh + "transformer."
    _conv1x1(sd, kh + "input_proj", params["input_proj"])
    _lin(sd, kh + "query_proj", params["query_proj"])
    sd[t + "mask_token"] = np.asarray(params["mask_token"])
    for i in range(cfg.num_encoder_layers):
        e = params[f"enc{i}"]
        p = f"{t}encoder.layers.{i}."
        _mha_fused(sd, p + "self_attn", e["self_attn"])
        _lin(sd, p + "linear1", e["linear1"])
        _lin(sd, p + "linear2", e["linear2"])
        _ln(sd, p + "norm1", e["norm1"])
        _ln(sd, p + "norm2", e["norm2"])
    pg = params["proposal_gen"]
    _lin(sd, t + "proposal_generator.support_proj", pg["support_proj"])
    _lin(sd, t + "proposal_generator.query_proj", pg["query_proj"])
    _lin(sd, t + "proposal_generator.dynamic_proj.0", pg["dynamic_fc1"])
    _lin(sd, t + "proposal_generator.dynamic_proj.2", pg["dynamic_fc2"])
    dec = params["decoder"]
    _ln(sd, t + "decoder.norm", dec["norm"])
    _lin(sd, t + "decoder.ref_point_head.layers.0",
         dec["ref_point_head"]["fc1"])
    _lin(sd, t + "decoder.ref_point_head.layers.1",
         dec["ref_point_head"]["fc2"])
    for i in range(cfg.num_decoder_layers):
        _decoder_layer(sd, f"{t}decoder.layers.{i}.", dec[f"layer{i}"],
                       two_way=False,
                       fairseq_self=cfg.use_bias_attn_module)
        kb = dec[f"kpt_branch{i}"]
        for j, name in [(0, "fc0"), (2, "fc1"), (4, "fc2"), (6, "out")]:
            _lin(sd, f"{kh}kpt_branch.{i}.mlp.{j}", kb[name])
    if "skeleton" in params:
        sk = params["skeleton"]
        if "image_project" in sk:
            _conv1x1(sd, kh + "skeleton_head.image_project",
                     sk["image_project"])
        for i in range(cfg.skeleton_num_layers):
            if f"refine{i}" in sk:
                _decoder_layer(
                    sd, f"{kh}skeleton_head.skeleton_predictor.{i}.",
                    sk[f"refine{i}"], two_way=True, fairseq_self=False)
        if "zero_conv_w" in sk:
            sd[kh + "skeleton_head.zero_conv.weight"] = np.asarray(
                sk["zero_conv_w"]).reshape(1, 1, 1, 1)
            sd[kh + "skeleton_head.zero_conv.bias"] = np.asarray(
                sk["zero_conv_b"])
    return sd


@pytest.mark.parametrize("stage_kw", [
    dict(),
    dict(learn_skeleton=True, masked_supervision=True),
    dict(learn_skeleton=True, attn_bias=True, use_bias_attn_module=True),
])
def test_convert_roundtrip(stage_kw):
    cfg = ModelConfig(max_kpt=12, image_size=56, heatmap_size=16,
                      **stage_kw)
    _, params = init_model(jax.random.PRNGKey(0), cfg)
    params = jax.device_get(params)
    sd = _to_reference_sd(params, cfg)
    converted = convert_head(sd, cfg)

    flat_o, tree_o = jax.tree_util.tree_flatten_with_path(params)
    flat_c, tree_c = jax.tree_util.tree_flatten_with_path(converted)
    paths_o = [jax.tree_util.keystr(k) for k, _ in flat_o]
    paths_c = [jax.tree_util.keystr(k) for k, _ in flat_c]
    assert paths_o == paths_c, (
        set(paths_o) ^ set(paths_c))
    for (k, a), (_, b) in zip(flat_o, flat_c):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6,
            err_msg=jax.tree_util.keystr(k))
