import time, numpy as np, jax, jax.numpy as jnp
from edgecape_tpu.config import ModelConfig
from edgecape_tpu.models import dinov2
from edgecape_tpu.models.edgecape import EdgeCape
cfg = ModelConfig(learn_skeleton=True, attn_bias=True, use_bias_attn_module=True)
model = EdgeCape(cfg); bb_cfg = dinov2.VIT_S14
k,hs = cfg.max_kpt, cfg.heatmap_size
bb_params = jax.jit(lambda r: dinov2.init_params(r, image_size=224))(jax.random.PRNGKey(0))
init = jax.jit(lambda r: model.init({'params': r, 'dropout': jax.random.PRNGKey(0)},
    jnp.zeros((1,16,16,384)), jnp.zeros((1,1,16,16,384)), jnp.zeros((1,1,k,hs,hs)), jnp.zeros((1,k)), jnp.zeros((1,k,k))))
head_params = init(jax.random.PRNGKey(1))['params']
def timeit(f, *a, n=3):
    np.asarray(f(*a))
    ts=[]
    for i in range(n):
        t0=time.perf_counter(); np.asarray(f(*a)); ts.append(time.perf_counter()-t0)
    return 1e3*min(ts)
rng = np.random.default_rng(0)
b=256
imgs = jnp.asarray(rng.normal(size=(2*b,224,224,3)), jnp.float32)
tgt = jnp.asarray(rng.uniform(size=(b,1,k,hs,hs)), jnp.float32)
w = jnp.ones((b,1,k)); adj = jnp.asarray(np.tile(np.eye(k,k=1,dtype=np.float32)+np.eye(k,k=-1,dtype=np.float32),(b,1,1)))
for name, dt in [('fp32', jnp.float32), ('bf16', jnp.bfloat16)]:
    f = jax.jit(lambda bb, im: dinov2.extract_features(bb, im, bb_cfg, dtype=dt).sum())
    print('backbone(512) %s: %.1f ms' % (name, timeit(f, bb_params, imgs)))
feats = jax.jit(lambda bb, im: dinov2.extract_features(bb, im, bb_cfg))(bb_params, imgs)
fs = jax.device_put(feats[:b].reshape(b,1,16,16,-1)); fq = jax.device_put(feats[b:])
# head components
def head_full(hp, fq, fs):
    out = model.apply({'params': hp}, fq, fs, tgt, jnp.prod(w,1), adj)
    return out.outputs[-1].sum()
print('head full: %.1f ms' % timeit(jax.jit(head_full), head_params, fq, fs))
def enc_only(hp, fq, fs):
    enc = model.apply({'params': hp}, fq, fs, tgt, jnp.prod(w,1), adj, method=EdgeCape.encode)
    return enc.kp_tokens.sum()+enc.proposals.sum()
print('encode only: %.1f ms' % timeit(jax.jit(enc_only), head_params, fq, fs))
