"""Measure the whole-decoder-in-Pallas path (fused_decoder_stack:
chunked layers + in-kernel glue) against the per-layer fused chain at
the eval head shape (512-row chunk, K=100 -> 128 padded, 16x16 image
grid, d_model 256, 8 heads, 3 layers, Markov bias ON).

Round-3 roofline: the decoder stage runs ~14.8 ms vs a ~5 ms
chained-matmul ideal; on top of the three Pallas programs the chain
pays per-layer XLA glue — the bias MLP (a [B, K, K, 12] fp32
intermediate and a [B, H, K, K] transpose per layer), sine embedding +
ref_point_head, and two kpt_branch MLPs. The stack moves all of it
in-kernel. This script decides whether to flip decoder_stack_default()
or to record a negative-ablation row in docs/performance.md.

Run ALONE on the box (1 CPU core; concurrent jobs skew everything).
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

from edgecape_tpu.config import ModelConfig  # noqa: E402
from edgecape_tpu.models.edgecape import EdgeCape, init_model  # noqa: E402
from edgecape_tpu.ops import pallas_config  # noqa: E402

B, K, HW, C = 512, 100, 256, 256
ITERS, RUNS = 5, 3


def timed(tag, fn, *args):
    out = fn(*args)
    # playbook rule: pull a SCALAR (tunnel-safe), never the full output
    s = float(jnp.sum(out[0].astype(jnp.float32)))
    best = 1e9
    for _ in range(RUNS):
        t0 = time.time()
        for _ in range(ITERS):
            out = fn(*args)
        s = float(jnp.sum(out[0].astype(jnp.float32)))
        best = min(best, (time.time() - t0) / ITERS)
    print(f"{tag}: {best*1000:.2f} ms/decode (sum={s:.1f})", flush=True)
    return best


def main():
    cfg = ModelConfig(max_kpt=K, image_size=256, heatmap_size=64,
                      use_flash=True, attn_bias=True,
                      use_bias_attn_module=True, learn_skeleton=True)
    _, params = init_model(jax.random.PRNGKey(0), cfg, batch=1, shots=1)
    model = EdgeCape(cfg)

    rng = np.random.default_rng(0)
    kp_tokens = jnp.asarray(rng.normal(size=(B, K, C)) * 0.2,
                            jnp.bfloat16)
    img_tokens = jnp.asarray(rng.normal(size=(B, HW, C)) * 0.2,
                             jnp.bfloat16)
    proposals = jnp.asarray(rng.uniform(0.1, 0.9, size=(B, K, 2)),
                            jnp.float32)
    adj = jnp.asarray(rng.uniform(0, 0.5, size=(B, 2, K, K)), jnp.float32)
    hops = jnp.asarray(rng.uniform(0, 1, size=(B, K, K, 5)), jnp.float32)
    valid = np.ones((B, K), bool)
    valid[:, 64:] = False
    kp_valid = jnp.asarray(valid)
    img_pos = jnp.asarray(rng.normal(size=(1, HW, C)) * 0.5, jnp.float32)

    def decode_fn(kp_tokens, img_tokens):
        outs, points = model.apply(
            {"params": params}, kp_tokens, img_tokens, proposals, adj,
            hops, kp_valid, img_pos, method=EdgeCape.decode)
        return outs, points[-1]

    # the stack switch is a trace-time Python branch: jit each variant
    # separately so the cache can't serve the wrong path
    pallas_config.set_decoder_stack(False)
    t_chain = timed("per-layer chain + XLA glue", jax.jit(decode_fn),
                    kp_tokens, img_tokens)

    pallas_config.set_decoder_stack(True)
    t_stack = timed("chunked stack (glue in-kernel)", jax.jit(decode_fn),
                    kp_tokens, img_tokens)
    pallas_config.set_decoder_stack(None)

    print(f"speedup: {t_chain / t_stack:.3f}x  "
          f"({(t_chain - t_stack)*1000:.2f} ms saved/chunk)", flush=True)


if __name__ == "__main__":
    main()
