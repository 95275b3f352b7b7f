import numpy as np
import pytest

import jax
import jax.numpy as jnp

from edgecape_tpu.models import dinov2

pytestmark = pytest.mark.slow  # heavy jit/model suite; excluded by -m 'not slow'


def test_shapes_random_init():
    cfg = dinov2.DinoV2Config(depth=2)
    params = dinov2.init_params(jax.random.PRNGKey(0), image_size=56, cfg=cfg)
    imgs = jnp.zeros((2, 56, 56, 3))
    out = dinov2.extract_features(params, imgs, cfg)
    assert out.shape == (2, 4, 4, 384)


def _build_torch_vit(torch, nn, cfg, grid_pretrain):
    """An independent torch implementation of the dinov2 block semantics
    (pre-norm + LayerScale + fused qkv + erf-GELU), used as the golden."""

    class TorchBlock(nn.Module):
        def __init__(self):
            super().__init__()
            d = cfg.embed_dim
            self.norm1 = nn.LayerNorm(d, eps=cfg.ln_eps)
            self.norm2 = nn.LayerNorm(d, eps=cfg.ln_eps)
            self.qkv = nn.Linear(d, 3 * d)
            self.proj = nn.Linear(d, d)
            self.fc1 = nn.Linear(d, int(d * cfg.mlp_ratio))
            self.fc2 = nn.Linear(int(d * cfg.mlp_ratio), d)
            self.ls1 = nn.Parameter(torch.full((d,), 1e-5))
            self.ls2 = nn.Parameter(torch.full((d,), 1e-5))
            self.nh = cfg.num_heads

        def forward(self, x):
            b, n, d = x.shape
            hd = d // self.nh
            h = self.norm1(x)
            qkv = self.qkv(h).reshape(b, n, 3, self.nh, hd)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            att = torch.einsum("bqhd,bkhd->bhqk", q * hd ** -0.5, k)
            att = att.softmax(-1)
            o = torch.einsum("bhqk,bkhd->bqhd", att, v).reshape(b, n, d)
            x = x + self.ls1 * self.proj(o)
            h = self.norm2(x)
            h = self.fc2(torch.nn.functional.gelu(self.fc1(h)))
            return x + self.ls2 * h

    class TorchViT(nn.Module):
        def __init__(self):
            super().__init__()
            d, p = cfg.embed_dim, cfg.patch_size
            self.patch = nn.Conv2d(3, d, kernel_size=p, stride=p)
            self.cls_token = nn.Parameter(torch.randn(1, 1, d) * 0.02)
            self.pos_embed = nn.Parameter(
                torch.randn(1, grid_pretrain * grid_pretrain + 1, d) * 0.02)
            self.blocks = nn.ModuleList(
                [TorchBlock() for _ in range(cfg.depth)])
            self.norm = nn.LayerNorm(d, eps=cfg.ln_eps)

        def interp_pos(self, gh, gw):
            cls_pos = self.pos_embed[:, :1]
            patch_pos = self.pos_embed[:, 1:]
            d = patch_pos.shape[-1]
            M = grid_pretrain
            t = patch_pos.reshape(1, M, M, d).permute(0, 3, 1, 2)
            sx = float(gw + 0.1) / M
            sy = float(gh + 0.1) / M
            t = torch.nn.functional.interpolate(
                t, scale_factor=(sy, sx), mode="bicubic", antialias=False)
            t = t.permute(0, 2, 3, 1).reshape(1, gh * gw, d)
            return torch.cat([cls_pos, t], dim=1)

        def forward(self, x):  # x [B, 3, H, W]
            b = x.shape[0]
            gh, gw = x.shape[2] // cfg.patch_size, x.shape[3] // cfg.patch_size
            t = self.patch(x).flatten(2).transpose(1, 2)  # [B, N, C]
            t = torch.cat([self.cls_token.expand(b, -1, -1), t], dim=1)
            t = t + self.interp_pos(gh, gw)
            for blk in self.blocks:
                t = blk(t)
            t = self.norm(t)
            return t[:, 1:].reshape(b, gh, gw, -1)

    return TorchViT()


def _torch_state_dict(model):
    """Re-key the test model's params into dinov2-hub naming."""
    sd = {}
    m = model.state_dict()
    sd["cls_token"] = m["cls_token"]
    sd["pos_embed"] = m["pos_embed"]
    sd["patch_embed.proj.weight"] = m["patch.weight"]
    sd["patch_embed.proj.bias"] = m["patch.bias"]
    sd["norm.weight"] = m["norm.weight"]
    sd["norm.bias"] = m["norm.bias"]
    i = 0
    while f"blocks.{i}.qkv.weight" in m:
        for a, b in [("norm1.weight",) * 2, ("norm1.bias",) * 2,
                     ("norm2.weight",) * 2, ("norm2.bias",) * 2,
                     ("attn.qkv.weight", "qkv.weight"),
                     ("attn.qkv.bias", "qkv.bias"),
                     ("attn.proj.weight", "proj.weight"),
                     ("attn.proj.bias", "proj.bias"),
                     ("mlp.fc1.weight", "fc1.weight"),
                     ("mlp.fc1.bias", "fc1.bias"),
                     ("mlp.fc2.weight", "fc2.weight"),
                     ("mlp.fc2.bias", "fc2.bias"),
                     ("ls1.gamma", "ls1"), ("ls2.gamma", "ls2")]:
            sd[f"blocks.{i}.{a}"] = m[f"blocks.{i}.{b}"]
        i += 1
    return sd


def test_forward_matches_torch_reference():
    torch = pytest.importorskip("torch")
    import torch.nn as nn

    torch.manual_seed(0)
    cfg = dinov2.DinoV2Config(patch_size=14, embed_dim=64, depth=3,
                              num_heads=4, pretrain_grid=9)
    tmodel = _build_torch_vit(torch, nn, cfg, grid_pretrain=9)
    tmodel.eval()

    img = torch.randn(2, 3, 70, 70)  # grid 5x5 -> forces pos interpolation
    with torch.no_grad():
        ref = tmodel(img).numpy()

    params = dinov2.convert_torch_state_dict(_torch_state_dict(tmodel),
                                             image_size=70, cfg=cfg)
    imgs_j = jnp.asarray(img.permute(0, 2, 3, 1).numpy())
    ours = np.asarray(dinov2.extract_features(params, imgs_j, cfg))
    np.testing.assert_allclose(ours, ref, atol=2e-5)
