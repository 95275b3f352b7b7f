import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/edgecape_jax_cache")
from edgecape_tpu.models import dinov2
from edgecape_tpu.ops import flash_attention as fa
bb_cfg = dinov2.VIT_S14
bb_params = jax.jit(lambda r: dinov2.init_params(r, image_size=224))(jax.random.PRNGKey(0))
rng = np.random.default_rng(0)
imgs = jnp.asarray(rng.normal(size=(512,224,224,3)), jnp.float32)
def timeit(f, *a, n=3):
    np.asarray(f(*a)); ts=[]
    for i in range(n):
        t0=time.perf_counter(); np.asarray(f(*a)); ts.append(time.perf_counter()-t0)
    return 1e3*min(ts)
f_x = jax.jit(lambda bb, im: dinov2.extract_features(bb, im, bb_cfg, dtype=jnp.bfloat16, use_flash=False).sum())
f_p = jax.jit(lambda bb, im: dinov2.extract_features(bb, im, bb_cfg, dtype=jnp.bfloat16, use_flash=True).sum())
print('backbone bf16 xla-attn:   %.1f ms' % timeit(f_x, bb_params, imgs))
print('backbone bf16 flash-attn: %.1f ms' % timeit(f_p, bb_params, imgs))
# correctness on real shapes
g_x = jax.jit(lambda bb, im: dinov2.extract_features(bb, im, bb_cfg, dtype=jnp.float32, use_flash=False))
g_p = jax.jit(lambda bb, im: dinov2.extract_features(bb, im, bb_cfg, dtype=jnp.float32, use_flash=True))
a = np.asarray(g_x(bb_params, imgs[:8])); b = np.asarray(g_p(bb_params, imgs[:8]))
print('feat diff flash vs xla (fp32 in/out): max %.5f mean %.6f' % (np.abs(a-b).max(), np.abs(a-b).mean()))
