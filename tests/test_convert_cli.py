"""End-to-end CLI test of scripts/convert_checkpoint.py: synthetic torch
state_dicts with REAL key naming (torch-hub dinov2_vits14 keys for the
backbone; the reference's keypoint_head_module.* / encoder_query.* keys
for a full EdgeCape checkpoint) -> orbax dirs -> loadable param trees.
Keeps ROADMAP #1 (reference-released-checkpoint parity run) one-command
ready: if the released .pth files ever become fetchable, this exact CLI
invocation is the recipe.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

import jax

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.slow  # heavy jit/model suite

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CLI = os.path.join(REPO, "scripts", "convert_checkpoint.py")


def _hub_dinov2_state_dict(seed=0, depth=12, dim=384, patch=14, grid=37):
    """Synthetic state_dict with torch-hub dinov2_vits14 key naming
    (facebookresearch/dinov2 DinoVisionTransformer.state_dict())."""
    g = torch.Generator().manual_seed(seed)

    def t(*shape):
        return torch.randn(*shape, generator=g) * 0.02

    sd = {
        "cls_token": t(1, 1, dim),
        "pos_embed": t(1, 1 + grid * grid, dim),
        "mask_token": t(1, dim),            # present in hub ckpts; unused
        "patch_embed.proj.weight": t(dim, 3, patch, patch),
        "patch_embed.proj.bias": t(dim),
        "norm.weight": t(dim),
        "norm.bias": t(dim),
    }
    for i in range(depth):
        p = f"blocks.{i}."
        sd.update({
            p + "norm1.weight": t(dim), p + "norm1.bias": t(dim),
            p + "norm2.weight": t(dim), p + "norm2.bias": t(dim),
            p + "ls1.gamma": t(dim), p + "ls2.gamma": t(dim),
            p + "attn.qkv.weight": t(3 * dim, dim),
            p + "attn.qkv.bias": t(3 * dim),
            p + "attn.proj.weight": t(dim, dim),
            p + "attn.proj.bias": t(dim),
            p + "mlp.fc1.weight": t(4 * dim, dim),
            p + "mlp.fc1.bias": t(4 * dim),
            p + "mlp.fc2.weight": t(dim, 4 * dim),
            p + "mlp.fc2.bias": t(dim),
        })
    return sd


def _run_cli(*args):
    proc = subprocess.run([sys.executable, CLI, *args], cwd=REPO,
                          stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                          timeout=600)
    assert proc.returncode == 0, proc.stdout.decode()[-2000:]
    return proc.stdout.decode()


def test_dinov2_cli_roundtrip(tmp_path):
    src = tmp_path / "dinov2_vits14.pth"
    torch.save(_hub_dinov2_state_dict(), src)
    out = tmp_path / "out"
    _run_cli("dinov2", str(src), str(out), "--image-size", "56")

    from edgecape_tpu.models import dinov2
    from edgecape_tpu.models.convert import load_backbone

    params = load_backbone(str(out / "backbone"), image_size=56)
    assert params is not None
    # loadable AND runnable: features at the 4x4 grid of 56px/14
    img = np.random.default_rng(0).normal(
        size=(1, 56, 56, 3)).astype(np.float32)
    feats = jax.jit(lambda p, x: dinov2.extract_features(p, x))(
        params, img)
    assert feats.shape == (1, 4, 4, 384)
    assert np.isfinite(np.asarray(feats)).all()


def test_ref2jax_cli_roundtrip(tmp_path):
    """Full reference checkpoint (head keys + encoder_query.* backbone,
    wrapped in {'state_dict': ...} like mmcv save_checkpoint) through the
    ref2jax CLI; the loaded head must BIT-match the source param tree."""
    from edgecape_tpu.config import Config, ModelConfig, stage3_config
    from edgecape_tpu.models.edgecape import init_model
    from edgecape_tpu.train import checkpoint as ck
    from tests.test_convert import _to_reference_sd

    # the exact cfg the CLI builds for --stage 3 --image-size 56
    cfg = stage3_config(Config(model=ModelConfig(image_size=56))).model
    _, params = init_model(jax.random.PRNGKey(0), cfg)
    params = jax.device_get(params)
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in _to_reference_sd(params, cfg).items()}
    for k, v in _hub_dinov2_state_dict(seed=1).items():
        sd["encoder_query." + k] = v
    src = tmp_path / "edgecape_stage3.pth"
    torch.save({"state_dict": sd, "meta": {"epoch": 99}}, src)

    out = tmp_path / "out"
    log = _run_cli("ref2jax", str(src), str(out), "--stage", "3",
                   "--image-size", "56")
    assert "head" in log and "backbone" in log

    head_tree = ck.load_checkpoint(str(out / "head"))
    loaded = head_tree["params"]
    flat_o = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_c = jax.tree_util.tree_flatten_with_path(loaded)[0]
    paths_o = [jax.tree_util.keystr(k) for k, _ in flat_o]
    paths_c = [jax.tree_util.keystr(k) for k, _ in flat_c]
    assert paths_o == paths_c, set(paths_o) ^ set(paths_c)
    for (k, a), (_, b) in zip(flat_o, flat_c):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6,
                                   err_msg=jax.tree_util.keystr(k))

    bb = ck.load_checkpoint(str(out / "backbone"))
    assert "block11" in bb and "patch_embed" in bb
