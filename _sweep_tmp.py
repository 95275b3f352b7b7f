import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/edgecape_jax_cache")
from edgecape_tpu.config import Config, ModelConfig, TrainConfig
from edgecape_tpu.models import dinov2
from edgecape_tpu.models.edgecape import EdgeCape
from edgecape_tpu.train.loop import TrainState, make_train_step
from edgecape_tpu.train.state import make_optimizer
K=100
for stage, kw in [("stage1", {}), ("stage2", dict(learn_skeleton=True, masked_supervision=True)),
                  ("stage3", dict(learn_skeleton=True, masked_supervision=True, attn_bias=True, use_bias_attn_module=True, model_freeze="skeleton"))]:
    mcfg = ModelConfig(**kw)
    cfg = Config(model=mcfg, train=TrainConfig(batch_size=16))
    model = EdgeCape(mcfg)
    bb = jax.jit(lambda r: dinov2.init_params(r, image_size=224))(jax.random.PRNGKey(0))
    init = jax.jit(lambda r: model.init({'params': r, 'dropout': jax.random.PRNGKey(0)},
        jnp.zeros((1,16,16,384)), jnp.zeros((1,1,16,16,384)), jnp.zeros((1,1,K,64,64)), jnp.zeros((1,K)), jnp.zeros((1,K,K))))
    params = init(jax.random.PRNGKey(1))['params']
    tx, _ = make_optimizer(cfg.train, 100, params, mcfg.model_freeze)
    step = jax.jit(make_train_step(model, tx, cfg, dinov2.VIT_S14), donate_argnums=(0,))
    b = 16
    rng = np.random.default_rng(0)
    batch = {"img_s": jnp.asarray(rng.normal(size=(b,1,224,224,3)), jnp.float32),
      "img_q": jnp.asarray(rng.normal(size=(b,224,224,3)), jnp.float32),
      "target_s": jnp.asarray(rng.uniform(size=(b,1,K,64,64)), jnp.float32),
      "weight_s": jnp.ones((b,1,K)), "target_q": jnp.asarray(rng.uniform(size=(b,K,64,64)), jnp.float32),
      "weight_q": jnp.ones((b,K)), "joints_q": jnp.asarray(rng.uniform(0,224,size=(b,K,2)), jnp.float32),
      "binary_adj": jnp.asarray(np.tile(np.eye(K,k=1,dtype=np.float32)+np.eye(K,k=-1,dtype=np.float32),(b,1,1))),
      "rand_mask": jnp.ones((b,K))}
    state = TrainState(params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32))
    state, m = step(state, bb, batch, jax.random.PRNGKey(0))
    float(m["loss"])
    ts=[]
    for i in range(4):
        t0=time.perf_counter()
        state, m = step(state, bb, batch, jax.random.fold_in(jax.random.PRNGKey(0), i))
        lv = float(m["loss"])
        ts.append(time.perf_counter()-t0)
    print("%s: %.1f ms/step (bs16) -> %.1f img/s  loss=%.3f" % (stage, 1e3*min(ts), 16/min(ts), lv))
