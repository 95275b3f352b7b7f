"""Per-stage timing of the cached-eval chunk on TPU.

Chains each stage ITERS times through a data dependency and reports
best-of-RUNS wall time per iteration (amortizes the sandbox tunnel's
~30ms dispatch latency; see docs/performance.md caveats). Run alone on
the box — concurrent jobs skew everything.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from edgecape_tpu.utils.runtime import honor_env_platforms  # noqa: E402
honor_env_platforms()

jax.config.update("jax_compilation_cache_dir", "/tmp/edgecape_jax_cache")

from edgecape_tpu.api import PoseEstimator, _maybe_normalize  # noqa: E402
from edgecape_tpu.config import Config, ModelConfig  # noqa: E402
from edgecape_tpu.models import dinov2  # noqa: E402

ITERS, RUNS = 8, 3
G, S, NQ, SIZE, K = 34, 1, 510, 224, 100


def _scalar(out):
    # playbook rule: pull a SCALAR — materializing a big output through
    # the tunnel (~33MB/s) costs seconds and pollutes the timing
    return np.asarray(sum(jnp.sum(jnp.abs(x.astype(jnp.float32)))
                          for x in jax.tree.leaves(out)
                          if hasattr(x, "dtype")))


def timed(tag, fn, *args):
    _scalar(fn(*args))  # compile

    best = float("inf")
    for _ in range(RUNS):
        t0 = time.perf_counter()
        o = None
        for _ in range(ITERS):
            o = fn(*args)
        _scalar(o)
        best = min(best, (time.perf_counter() - t0) / ITERS)
    print(f"{tag:28s} {best * 1e3:8.2f} ms", flush=True)
    return best


def main():
    rng = np.random.default_rng(0)
    cfg = Config(model=ModelConfig(
        learn_skeleton=True, attn_bias=True, use_bias_attn_module=True,
        use_flash=True, compute_dtype="bfloat16", head_dtype="bfloat16"))
    est = PoseEstimator(cfg, rng=jax.random.PRNGKey(0))
    bb, hp = est.backbone_params, est.head_params

    img_q = jnp.asarray(rng.normal(size=(NQ, SIZE, SIZE, 3)),
                        jnp.float32)
    img_s = jnp.asarray(rng.normal(size=(G, S, SIZE, SIZE, 3)),
                        jnp.float32)
    joints_s = jnp.asarray(rng.uniform(10, SIZE - 10, size=(G, S, K, 2)),
                           jnp.float32)
    vis_s = jnp.ones((G, S, K), jnp.float32)
    adj = jnp.asarray(np.tile(np.eye(K, k=1) + np.eye(K, k=-1),
                              (G, 1, 1)), jnp.float32)
    group = jnp.asarray(np.repeat(np.arange(G), NQ // G), jnp.int32)

    sup, qry, comb = est._build_cached_fns()

    # stage: backbone alone on the query images (bf16 fused path)
    bb_fwd = jax.jit(lambda p, im: dinov2.fast_forward(
        p, _maybe_normalize(im)))
    timed("backbone(510q)", bb_fwd, bb, img_q)

    # stage: support phase (34 groups: backbone + pool + skeleton)
    timed("support(34g)", sup, bb, hp, img_s, joints_s, vis_s, adj)

    ctx = sup(bb, hp, img_s, joints_s, vis_s, adj)
    jax.block_until_ready(jax.tree.leaves(ctx)[0])

    # stage: full query phase (backbone + encoder + decoder + glue)
    timed("query(510)", qry, bb, hp, ctx, group, img_q)

    # stage: head only (encoder+decoder+glue) — query phase minus backbone
    feat_q = bb_fwd(bb, img_q)
    _scalar(feat_q)

    model = est.model
    import functools

    @functools.partial(jax.jit, static_argnames=())
    def head_only(head_params, ctx_, grp, fq):
        from edgecape_tpu.api import _cast_floats
        rows = jax.tree.map(lambda a: a[grp], ctx_)
        head_params = _cast_floats(head_params, jnp.bfloat16)
        rows = _cast_floats(rows, jnp.bfloat16)
        fq = fq.astype(jnp.bfloat16)
        enc = model.apply({"params": head_params}, fq, rows,
                          method=type(model).encode_query)
        outputs, _ = model.apply(
            {"params": head_params}, enc.kp_tokens, enc.img_tokens,
            enc.proposals, enc.adj, enc.hop_stack, enc.kp_valid,
            enc.img_pos, method=type(model).decode)
        return outputs[-1].astype(jnp.float32)

    timed("head(enc+dec+glue)", head_only, hp, ctx, group, feat_q)

    @functools.partial(jax.jit)
    def enc_only(head_params, ctx_, grp, fq):
        from edgecape_tpu.api import _cast_floats
        rows = jax.tree.map(lambda a: a[grp], ctx_)
        head_params = _cast_floats(head_params, jnp.bfloat16)
        rows = _cast_floats(rows, jnp.bfloat16)
        fq = fq.astype(jnp.bfloat16)
        enc = model.apply({"params": head_params}, fq, rows,
                          method=type(model).encode_query)
        return enc.kp_tokens

    timed("encode_query(510)", enc_only, hp, ctx, group, feat_q)

    # ---- kernel-vs-glue splits inside the head
    from edgecape_tpu.ops.fused_decoder import fused_decoder_layer
    from edgecape_tpu.ops.fused_encoder import fused_encoder_layer

    d_model = cfg.model.d_model
    nhead = cfg.model.nhead
    hw = (SIZE // 14) ** 2
    kp_tok = jnp.asarray(rng.normal(size=(NQ, K, d_model)), jnp.float32)
    img_tok = jnp.asarray(rng.normal(size=(NQ, hw, d_model)), jnp.float32)
    qpos = jnp.asarray(rng.normal(size=(NQ, K, d_model)), jnp.float32)
    ipos = jnp.asarray(rng.normal(size=(hw, d_model)), jnp.float32)
    kpv = jnp.ones((NQ, K), bool)
    bias0 = jnp.zeros((NQ, nhead, K, K), jnp.float32)
    adj2 = jnp.asarray(rng.uniform(size=(NQ, 2, K, K)), jnp.float32)
    lp = hp["decoder"]["layer0"]

    @jax.jit
    def dec_kernels(x):
        for _ in range(3):
            x = fused_decoder_layer(x, qpos, img_tok, ipos, kpv, bias0,
                                    adj2, lp, num_heads=nhead)
        return x

    timed("3x dec kernel only", dec_kernels, kp_tok)

    tok356 = jnp.asarray(rng.normal(size=(NQ, hw + K, d_model)),
                         jnp.float32)
    pos356 = jnp.asarray(rng.normal(size=(hw + K, d_model)), jnp.float32)
    val356 = jnp.ones((NQ, hw + K), bool)
    ep = hp["enc0"]
    at = ep["self_attn"]

    @jax.jit
    def enc_kernels(x):
        for _ in range(3):
            x = fused_encoder_layer(
                x, pos356, val356,
                at["q_proj"]["kernel"], at["q_proj"]["bias"],
                at["k_proj"]["kernel"], at["k_proj"]["bias"],
                at["v_proj"]["kernel"], at["v_proj"]["bias"],
                at["out_proj"]["kernel"], at["out_proj"]["bias"],
                ep["norm1"]["scale"], ep["norm1"]["bias"],
                ep["linear1"]["kernel"], ep["linear1"]["bias"],
                ep["linear2"]["kernel"], ep["linear2"]["bias"],
                ep["norm2"]["scale"], ep["norm2"]["bias"],
                num_heads=nhead, eps=1e-5)
        return x

    timed("3x enc kernel only", enc_kernels, tok356)

    # stage: whole chunk (support + query), the bench configuration
    timed("combined(chunk)", comb, bb, hp, img_s, joints_s, vis_s, adj,
          group, img_q)


if __name__ == "__main__":
    main()
