import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/edgecape_jax_cache")
from edgecape_tpu.api import PoseEstimator
from edgecape_tpu.config import Config, ModelConfig
mcfg = ModelConfig(learn_skeleton=True, attn_bias=True, use_bias_attn_module=True, compute_dtype="bfloat16")
est = PoseEstimator(Config(model=mcfg), rng=jax.random.PRNGKey(0))
g, s, k, hs, size = 17, 1, 100, 64, 224
nq = g*15
rng = np.random.default_rng(0)
support = {"img_s": jnp.asarray(rng.normal(size=(g,s,size,size,3)), jnp.float32),
  "target_s": jnp.asarray(rng.uniform(size=(g,s,k,hs,hs)), jnp.float32),
  "weight_s": jnp.ones((g,s,k)), "binary_adj": jnp.asarray(np.tile(np.eye(k,k=1,dtype=np.float32)+np.eye(k,k=-1,dtype=np.float32),(g,1,1)))}
img_q = jnp.asarray(rng.normal(size=(nq,size,size,3)), jnp.float32)
group = jnp.asarray(np.repeat(np.arange(g, dtype=np.int32), 15))
sup_fn, q_fn = est._build_cached_fns()
ctx = sup_fn(est.backbone_params, est.head_params, support["img_s"], support["target_s"], support["weight_s"], support["binary_adj"])
jax.tree.map(np.asarray, ctx)
def timeit(f, n=3):
    ts=[]
    for i in range(n):
        t0=time.perf_counter(); f(i); ts.append(time.perf_counter()-t0)
    return 1e3*min(ts)
print('support_fn: %.1f ms' % timeit(lambda i: np.asarray(sup_fn(est.backbone_params, est.head_params, support["img_s"]+i*1e-3, support["target_s"], support["weight_s"], support["binary_adj"]).kp_tokens0)))
o = q_fn(est.backbone_params, est.head_params, ctx, group, img_q); np.asarray(o[0])
print('query_fn(255): %.1f ms' % timeit(lambda i: np.asarray(q_fn(est.backbone_params, est.head_params, ctx, group, img_q+i*1e-3)[0])))
