"""Numeric regression guard: full-model outputs for a pinned seed/input are
frozen into a committed golden file. Any future refactor that unintentionally
changes the math (layer order, init, masking, adjacency normalization...)
trips this test; intentional changes regenerate via
REGEN_GOLDENS=1 python -m pytest tests/test_regression_golden.py.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from edgecape_tpu.config import ModelConfig
from edgecape_tpu.models.edgecape import EdgeCape

pytestmark = pytest.mark.slow  # heavy jit/model suite; excluded by -m 'not slow'

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens",
                      "model_forward_v1.npz")


def _forward():
    cfg = ModelConfig(max_kpt=12, image_size=56, heatmap_size=16,
                      learn_skeleton=True, attn_bias=True,
                      use_bias_attn_module=True)
    model = EdgeCape(cfg)
    rng = np.random.default_rng(1234)
    feat_q = jnp.asarray(rng.normal(size=(2, 4, 4, 384)), jnp.float32)
    feat_s = jnp.asarray(rng.normal(size=(2, 1, 4, 4, 384)), jnp.float32)
    tgt_s = jnp.asarray(rng.uniform(size=(2, 1, 12, 16, 16)), jnp.float32)
    mask = np.ones((2, 12), np.float32)
    mask[0, 8:] = 0
    adj = np.zeros((2, 12, 12), np.float32)
    for i, j in [(0, 1), (1, 2), (2, 3), (3, 0)]:
        adj[:, i, j] = adj[:, j, i] = 1
    init = jax.jit(lambda r: model.init(
        {"params": r, "dropout": jax.random.PRNGKey(0)}, feat_q, feat_s,
        tgt_s, jnp.asarray(mask), jnp.asarray(adj)))
    params = init(jax.random.PRNGKey(7))["params"]
    out = jax.jit(lambda p: model.apply(
        {"params": p}, feat_q, feat_s, tgt_s, jnp.asarray(mask),
        jnp.asarray(adj)))(params)
    return {
        "outputs": np.asarray(out.outputs),
        "proposals": np.asarray(out.encode.proposals),
        "proposals_for_loss": np.asarray(out.encode.proposals_for_loss),
        "adj": np.asarray(out.encode.adj),
        "raw_adj": np.asarray(out.encode.raw_adj),
        "hop_stack": np.asarray(out.encode.hop_stack),
    }


def test_model_forward_matches_golden():
    got = _forward()
    if os.environ.get("REGEN_GOLDENS") or not os.path.exists(GOLDEN):
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        np.savez_compressed(GOLDEN, **got)
        if not os.environ.get("REGEN_GOLDENS"):
            pytest.skip("golden created; rerun to compare")
    ref = np.load(GOLDEN)
    for key in ref.files:
        np.testing.assert_allclose(
            got[key], ref[key], atol=2e-5, rtol=2e-5,
            err_msg=f"numeric drift in {key} — if intentional, regenerate "
                    f"with REGEN_GOLDENS=1")
