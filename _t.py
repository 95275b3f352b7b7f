import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/edgecape_jax_cache")
from edgecape_tpu.models import dinov2
bb_cfg = dinov2.VIT_S14
bb = jax.jit(lambda r: dinov2.init_params(r, image_size=224))(jax.random.PRNGKey(0))
rng = np.random.default_rng(0)
imgs = jnp.asarray(rng.normal(size=(512,224,224,3)), jnp.float32)
f_flax = jax.jit(lambda p, im: dinov2.extract_features(p, im, bb_cfg, dtype=jnp.bfloat16, use_flash=True).sum())
f_fast = jax.jit(lambda p, im: dinov2.fast_forward(p, im, bb_cfg).sum())
def timeit(f, *a, n=3):
    np.asarray(f(*a)); ts=[]
    for i in range(n):
        t0=time.perf_counter(); np.asarray(f(*a)); ts.append(time.perf_counter()-t0)
    return 1e3*min(ts)
print('flax bf16+flash: %.1f ms' % timeit(f_flax, bb, imgs))
print('fast_forward:    %.1f ms' % timeit(f_fast, bb, imgs))
# correctness
a = np.asarray(jax.jit(lambda p, im: dinov2.extract_features(p, im, bb_cfg, dtype=jnp.bfloat16, use_flash=True))(bb, imgs[:8]))
bq = np.asarray(jax.jit(lambda p, im: dinov2.fast_forward(p, im, bb_cfg))(bb, imgs[:8]))
print('diff vs flax-bf16: max %.4f mean %.5f scale %.3f' % (np.abs(a-bq).max(), np.abs(a-bq).mean(), np.abs(a).mean()))
