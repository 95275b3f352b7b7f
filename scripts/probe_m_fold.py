"""Probe: does folding a row group's per-image matmuls into one tall
matmul (M = g*Np instead of a loop of g matmuls at M=Np) speed up the
fused-block kernels on hardware?

Hypothesis (untested by the five recorded ablations in
docs/performance.md): the MXU streams M rows through a stationary
[128,128] weight tile with a pipeline fill/drain per tile-pair, so at
M=264 (backbone) a third of each tile-pair's cycles are fill/drain
(~128/(264+128)); at the decoder's M=104 it is over half. The fused
kernels loop `for g in range(group)` and issue every matmul at M=Np
(ops/fused_vit_block.py:_kernel), so the waste — if real on this chip —
is paid g times. Folding qkv/proj/MLP to M=g*Np keeps results
bit-identical (row-wise ops; per-row K-accumulation order unchanged).

This measures the PURE matmul chain both ways inside Pallas (one kernel
per variant, same total FLOPs, weights resident) before committing to a
kernel restructure. Run alone on the box.
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from edgecape_tpu.utils.runtime import honor_env_platforms  # noqa: E402
honor_env_platforms()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/edgecape_jax_cache")

ITERS, RUNS = 20, 3


def _mm_chain(x, w1, w2, reps):
    """reps x (x@w1 -> bf16 -> @w2 -> bf16 residual-ish) — the fused
    block's MLP shape chain, dependency-chained so reps scale time."""
    for _ in range(reps):
        h = jax.lax.dot_general(x, w1, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        h = h.astype(jnp.bfloat16)
        y = jax.lax.dot_general(h, w2, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        x = (x.astype(jnp.float32) + y).astype(jnp.bfloat16)
    return x


def make_kernel(g, n, c, f, reps, fold):
    def kernel(x_ref, w1_ref, w2_ref, o_ref):
        if fold:
            x = x_ref[:].reshape(g * n, c)
            o_ref[:] = _mm_chain(x, w1_ref[:], w2_ref[:], reps) \
                .reshape(g, n, c)
        else:
            for i in range(g):
                o_ref[i] = _mm_chain(x_ref[i], w1_ref[:], w2_ref[:], reps)

    return kernel


def run(b, g, n, c, f, reps, fold, interpret=False):
    rep2 = lambda i: (0, 0)  # noqa: E731
    fn = pl.pallas_call(
        make_kernel(g, n, c, f, reps, fold),
        out_shape=jax.ShapeDtypeStruct((b, n, c), jnp.bfloat16),
        grid=(b // g,),
        in_specs=[
            pl.BlockSpec((g, n, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, f), rep2, memory_space=pltpu.VMEM),
            pl.BlockSpec((f, c), rep2, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g, n, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )
    fn = jax.jit(fn)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, n, c)), jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(size=(c, f)) * 0.05, jnp.bfloat16)
    w2 = jnp.asarray(rng.normal(size=(f, c)) * 0.05, jnp.bfloat16)
    out = fn(x, w1, w2)
    jax.block_until_ready(out)

    best = float("inf")
    for _ in range(RUNS):
        t0 = time.perf_counter()
        o = None
        for _ in range(ITERS):
            o = fn(x, w1, w2)
        jax.block_until_ready(o)
        best = min(best, (time.perf_counter() - t0) / ITERS)
    flops = 2 * 2 * b * n * c * f * reps
    return best, flops, np.asarray(out[0, 0, :2], np.float32)


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    # (label, b, g, n, c, f, reps): backbone MLP shape at eval chunk;
    # decoder kpt-token shape (M=104 is the worst fill/drain case)
    cases = [
        ("backbone n=264 c=384 f=1536 g=2", 512, 2, 264, 384, 1536, 6),
        ("backbone n=264 g=4", 512, 4, 264, 384, 1536, 6),
        ("decoder  n=104 c=256 f=1024 g=6", 510, 6, 104, 256, 1024, 6),
    ]
    for label, b, g, n, c, f, reps in cases:
        t_loop, flops, v_loop = run(b, g, n, c, f, reps, fold=False)
        t_fold, _, v_fold = run(b, g, n, c, f, reps, fold=True)
        bitsame = bool(np.array_equal(v_loop, v_fold))
        print(f"{label:36s} loop {t_loop * 1e3:7.2f} ms "
              f"({flops / t_loop / 1e12:5.1f} TF/s)  "
              f"fold {t_fold * 1e3:7.2f} ms "
              f"({flops / t_fold / 1e12:5.1f} TF/s)  "
              f"speedup {t_loop / t_fold:.3f}x  bitsame={bitsame}",
              flush=True)


if __name__ == "__main__":
    main()
