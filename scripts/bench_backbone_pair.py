"""Measure the 2-block-deep fused ViT kernel (fused_vit_block2) against
the single-block baseline at the eval backbone shape (510 query images,
224px, ViT-S/14 = 512-row padded batch of 257-token blocks).

Round-3 roofline: the backbone stage runs 63.8ms vs a ~34ms chained-matmul
ideal, attributed to serial MXU-burst/VPU-pass chains per program.
Pairing blocks halves the program count and doubles the in-VMEM chain —
this script decides whether that's a win (flip the pair_blocks default)
or the next negative-ablation row (record it in docs/performance.md).

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

from edgecape_tpu.models import dinov2  # noqa: E402

ITERS, RUNS = 8, 3
NQ, SIZE = 510, 224


def timed(tag, fn, *args):
    out = fn(*args)
    np.asarray(jnp.sum(jnp.abs(out.astype(jnp.float32))))  # compile+sync
    best = float("inf")
    for _ in range(RUNS):
        t0 = time.perf_counter()
        o = None
        for _ in range(ITERS):
            o = fn(*args)
        np.asarray(jnp.sum(jnp.abs(o.astype(jnp.float32))))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    print(f"{tag:32s} {best * 1e3:8.2f} ms", flush=True)
    return best


def main():
    rng = np.random.default_rng(0)
    params = jax.jit(lambda r: dinov2.init_params(r, image_size=SIZE))(
        jax.random.PRNGKey(0))
    img = jnp.asarray(rng.normal(size=(NQ, SIZE, SIZE, 3)), jnp.float32)

    single = jax.jit(lambda p, im: dinov2.fast_forward(p, im))
    paired = jax.jit(lambda p, im: dinov2.fast_forward(p, im,
                                                       pair_blocks=True))

    t1 = timed("backbone single-block (base)", single, params, img)
    t2 = timed("backbone paired-block (2-deep)", paired, params, img)
    # bit-parity spot check on a small slice
    a = np.asarray(single(params, img[:8]), np.float32)
    b = np.asarray(paired(params, img[:8]), np.float32)
    exact = np.array_equal(a, b)
    print(f"bit-identical on 8-img slice: {exact}")
    print(f"pairing speedup: {t1 / t2:.3f}x "
          f"({t1 * 1e3:.2f} -> {t2 * 1e3:.2f} ms)")


if __name__ == "__main__":
    main()
