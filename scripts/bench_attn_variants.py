"""Micro-bench: fused ViT attention-block variants on the real chip.

Times N chained applications of each variant over the eval-shaped batch
(512 images, 257 tokens, C=384, 6 heads) to amortize the sandbox tunnel's
~30ms dispatch latency, and prints ms/layer. Used to pick the kernel
configuration for docs/performance.md's MFU ladder — run alone (1-core
box: concurrent jobs skew everything).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from edgecape_tpu.utils.runtime import honor_env_platforms  # noqa: E402
honor_env_platforms()

jax.config.update("jax_compilation_cache_dir", "/tmp/edgecape_jax_cache")

from edgecape_tpu.ops.fused_attn_block import fused_attn_block  # noqa: E402
from edgecape_tpu.ops.fused_mlp import fused_ln_mlp  # noqa: E402

B, N, C, H = 512, 257, 384, 6
LAYERS = 12
ITERS = 8


def _params(rng):
    p = {
        "lns": rng.normal(size=(C,)).astype(np.float32),
        "lnb": rng.normal(size=(C,)).astype(np.float32),
        "wq": (rng.normal(size=(C, C)) / np.sqrt(C)).astype(np.float32),
        "bq": rng.normal(size=(C,)).astype(np.float32),
        "wk": (rng.normal(size=(C, C)) / np.sqrt(C)).astype(np.float32),
        "bk": rng.normal(size=(C,)).astype(np.float32),
        "wv": (rng.normal(size=(C, C)) / np.sqrt(C)).astype(np.float32),
        "bv": rng.normal(size=(C,)).astype(np.float32),
        "wp": (rng.normal(size=(C, C)) / np.sqrt(C)).astype(np.float32),
        "bp": rng.normal(size=(C,)).astype(np.float32),
        "ls": np.full((C,), 0.1, np.float32),
        # mlp
        "n2s": rng.normal(size=(C,)).astype(np.float32),
        "n2b": rng.normal(size=(C,)).astype(np.float32),
        "w1": (rng.normal(size=(C, 4 * C)) / np.sqrt(C)).astype(np.float32),
        "b1": rng.normal(size=(4 * C,)).astype(np.float32),
        "w2": (rng.normal(size=(4 * C, C)) / np.sqrt(4 * C)).astype(
            np.float32),
        "b2": rng.normal(size=(C,)).astype(np.float32),
        "ls2": np.full((C,), 0.1, np.float32),
    }
    return {k: jnp.asarray(v) for k, v in p.items()}


def chain_attn(x, p):
    for _ in range(LAYERS):
        x = fused_attn_block(x, p["lns"], p["lnb"], p["wq"], p["bq"],
                             p["wk"], p["bk"], p["wv"], p["bv"], p["wp"],
                             p["bp"], p["ls"], num_heads=H)
    return x


def chain_mlp(x, p):
    for _ in range(LAYERS):
        x = fused_ln_mlp(x, p["n2s"], p["n2b"], p["w1"], p["b1"], p["w2"],
                         p["b2"], p["ls2"])
    return x


def chain_both(x, p):
    for _ in range(LAYERS):
        x = fused_attn_block(x, p["lns"], p["lnb"], p["wq"], p["bq"],
                             p["wk"], p["bk"], p["wv"], p["bv"], p["wp"],
                             p["bp"], p["ls"], num_heads=H)
        x = fused_ln_mlp(x, p["n2s"], p["n2b"], p["w1"], p["b1"], p["w2"],
                         p["b2"], p["ls2"])
    return x


def time_fn(fn, x, p, tag):
    f = jax.jit(fn)
    y = f(x, p)
    _ = float(jnp.sum(y.astype(jnp.float32)))  # materialize (tunnel-safe)
    best = 1e9
    for _ in range(ITERS):
        t0 = time.time()
        y = f(x, p)
        s = float(jnp.sum(y.astype(jnp.float32)))
        best = min(best, time.time() - t0)
    per_layer = best * 1000 / LAYERS
    print(f"{tag}: {best*1000:.1f}ms total, {per_layer:.2f}ms/layer "
          f"(sum={s:.1f})", flush=True)
    return per_layer


def chain_block(x, p):
    from edgecape_tpu.ops.fused_vit_block import fused_vit_block
    for _ in range(LAYERS):
        x = fused_vit_block(x, p["lns"], p["lnb"], p["wq"], p["bq"],
                            p["wk"], p["bk"], p["wv"], p["bv"], p["wp"],
                            p["bp"], p["ls"], p["n2s"], p["n2b"], p["w1"],
                            p["b1"], p["w2"], p["b2"], p["ls2"],
                            num_heads=H)
    return x


def main():
    rng = np.random.default_rng(0)
    p = _params(rng)
    x = jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32))
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "attn"):
        time_fn(chain_attn, x, p, "attn_block")
    if which in ("all", "mlp"):
        time_fn(chain_mlp, x, p, "ln_mlp")
    if which in ("all", "both"):
        time_fn(chain_both, x, p, "attn+mlp")
    if which in ("all", "block"):
        time_fn(chain_block, x, p, "vit_block(one kernel)")


if __name__ == "__main__":
    main()
