"""Measure the whole-encoder-in-one-kernel path (fused_encoder_stack)
against the per-layer chain at the eval head shape (510-query chunk —
34 groups x 15 queries, the EXACT production row count so the kernel's
row-group selection matches what bench.py's eval phase runs — 356
tokens -> 384 padded, d_model 256, 8 heads, FFN 384, 3 layers).

Round-3 roofline: the encoder stage runs ~14 ms vs a ~5 ms
chained-matmul ideal, attributed to serial MXU-burst/VPU-pass chains
per program. Stacking the 3 layers into one program triples the
in-VMEM chain and cuts the inter-layer activation HBM round-trips —
this script decides whether to flip encoder_stack_default() or to
record negative-ablation row #5 in docs/performance.md.

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

from edgecape_tpu.ops import fused_encoder as fe  # noqa: E402

B, N, C, F, H, LAYERS = 510, 356, 256, 384, 8, 3
ITERS, RUNS = 8, 3


def _layers(rng):
    mk = lambda *sh, s=0.05: jnp.asarray(  # noqa: E731
        rng.normal(size=sh) * s, jnp.float32)
    return tuple(
        (mk(C, C), mk(C, s=0.1), mk(C, C), mk(C, s=0.1),
         mk(C, C), mk(C, s=0.1), mk(C, C), mk(C, s=0.1),
         jnp.ones(C), mk(C, s=0.1),
         mk(C, F), mk(F, s=0.1), mk(F, C), mk(C, s=0.1),
         jnp.ones(C), mk(C, s=0.1))
        for _ in range(LAYERS))


def timed(tag, fn, *args):
    out = fn(*args)
    # playbook rule: pull a SCALAR (tunnel-safe), never the full output
    s = float(jnp.sum(out.astype(jnp.float32)))
    best = 1e9
    for _ in range(RUNS):
        t0 = time.time()
        for _ in range(ITERS):
            out = fn(*args)
        s = float(jnp.sum(out.astype(jnp.float32)))
        best = min(best, (time.time() - t0) / ITERS)
    print(f"{tag}: {best*1000:.2f} ms/encoder ({best*1000/LAYERS:.2f} "
          f"ms/layer, sum={s:.1f})", flush=True)
    return best


def main():
    rng = np.random.default_rng(0)
    layers = _layers(rng)
    tokens = jnp.asarray(rng.normal(size=(B, N, C)), jnp.float32)
    pos = jnp.asarray(rng.normal(size=(N, C)) * 0.5, jnp.float32)
    valid = np.ones((B, N), bool)
    valid[:, N - 100 + 64:] = False   # ~ K=100 kp slots, 64 valid
    valid = jnp.asarray(valid)

    @jax.jit
    def chain(tokens):
        x = tokens
        for lw in layers:
            x = fe.fused_encoder_layer(x, pos, valid, *lw, num_heads=H)
        return x

    @jax.jit
    def stack(tokens):
        return fe.fused_encoder_stack(tokens, pos, valid, layers,
                                      num_heads=H)

    t_chain = timed("per-layer chain (3 programs)", chain, tokens)
    t_stack = timed("whole-encoder stack (1 program)", stack, tokens)
    a = np.asarray(chain(tokens))
    b = np.asarray(stack(tokens))
    bit_same = np.array_equal(a, b)
    print(f"bitwise identical: {bit_same}")
    print(f"speedup: {t_chain / t_stack:.3f}x "
          f"({(t_chain - t_stack)*1000:.2f} ms saved/chunk)")


if __name__ == "__main__":
    main()
