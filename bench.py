"""Benchmark: MP-100 1-shot eval throughput (images/sec/chip).

Baseline: the reference evaluates the full MP-100 1-shot test split
(100 classes x 200 episodes x 15 queries = 300k query images) in ~30 min on
one GPU (reference README.md:87) => ~167 images/sec. vs_baseline is our
per-chip throughput over that number.

The bench runs the full inference path on synthetic episodes — DINOv2
ViT-S/14 on 224x224 support+query, heatmap pooling, skeleton prediction
with Markov bias, 3-layer graph decoder — batched, on whatever accelerator
jax selects (the driver provides one real TPU chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_IMG_PER_SEC = 300000 / 1800.0  # reference: 30 min on 1 GPU


def main(batch: int = 64, iters: int = 10, warmup: int = 2):
    import jax
    import jax.numpy as jnp

    try:  # persistent compile cache: keeps repeat bench runs fast
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/edgecape_jax_cache")
    except Exception:
        pass

    from edgecape_tpu.config import ModelConfig
    from edgecape_tpu.models import dinov2
    from edgecape_tpu.models.edgecape import EdgeCape

    # production eval path: bf16 backbone + Pallas fused attention
    compute_dtype = jnp.float32 if "--fp32" in sys.argv else jnp.bfloat16

    cfg = ModelConfig(learn_skeleton=True, attn_bias=True,
                      use_bias_attn_module=True)
    model = EdgeCape(cfg)
    bb_cfg = dinov2.VIT_S14
    b, s, k, hs = batch, 1, cfg.max_kpt, cfg.heatmap_size
    g = cfg.image_size // cfg.patch_size

    bb_params = jax.jit(lambda r: dinov2.init_params(
        r, image_size=cfg.image_size))(jax.random.PRNGKey(0))
    init = jax.jit(lambda r: model.init(
        {"params": r, "dropout": jax.random.PRNGKey(0)},
        jnp.zeros((1, g, g, cfg.backbone_dim)),
        jnp.zeros((1, s, g, g, cfg.backbone_dim)),
        jnp.zeros((1, s, k, hs, hs)), jnp.zeros((1, k)),
        jnp.zeros((1, k, k))))
    head_params = init(jax.random.PRNGKey(1))["params"]

    @jax.jit
    def forward(bb_params, head_params, img_s, img_q, target_s, weight_s,
                binary_adj):
        bs, sh = img_s.shape[:2]
        imgs = jnp.concatenate(
            [img_s.reshape((bs * sh,) + img_s.shape[2:]), img_q], axis=0)
        feats = dinov2.extract_features(bb_params, imgs, bb_cfg,
                                        dtype=compute_dtype)
        gh, gw = feats.shape[1:3]
        feat_s = feats[:bs * sh].reshape(bs, sh, gh, gw, -1)
        feat_q = feats[bs * sh:]
        mask_s = jnp.prod(weight_s, axis=1)
        out = model.apply({"params": head_params}, feat_q, feat_s, target_s,
                          mask_s, binary_adj)
        return out.outputs[-1]

    rng = np.random.default_rng(0)
    img_s = jnp.asarray(rng.normal(
        size=(b, s, cfg.image_size, cfg.image_size, 3)), jnp.float32)
    img_q = jnp.asarray(rng.normal(
        size=(b, cfg.image_size, cfg.image_size, 3)), jnp.float32)
    target_s = jnp.asarray(rng.uniform(size=(b, s, k, hs, hs)), jnp.float32)
    weight_s = jnp.ones((b, s, k), jnp.float32)
    adj = np.tile(np.eye(k, k=1, dtype=np.float32)
                  + np.eye(k, k=-1, dtype=np.float32), (b, 1, 1))
    adj = jnp.asarray(adj)

    args = (bb_params, head_params, img_s, img_q, target_s, weight_s, adj)
    # NOTE: materialize the output on host each iteration — on the axon
    # tunnel block_until_ready() does not actually block, and eval decodes
    # predictions host-side anyway, so this is the honest timing.
    for i in range(warmup):
        np.asarray(forward(*args))
    best_dt = float("inf")
    for _ in range(2):  # two timing loops; first can absorb stragglers
        t0 = time.perf_counter()
        for i in range(iters):
            np.asarray(forward(bb_params, head_params, img_s,
                               img_q + i * 1e-3, target_s, weight_s, adj))
        best_dt = min(best_dt, time.perf_counter() - t0)

    img_per_sec = batch * iters / best_dt
    n_chips = max(jax.device_count(), 1)
    per_chip = img_per_sec / n_chips
    print(json.dumps({
        "metric": "mp100_1shot_eval_images_per_sec_per_chip",
        "value": round(per_chip, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(per_chip / BASELINE_IMG_PER_SEC, 3),
    }))


if __name__ == "__main__":
    batch = 256
    for a in sys.argv[1:]:
        if a.startswith("--batch="):
            batch = int(a.split("=")[1])
    main(batch=batch)
