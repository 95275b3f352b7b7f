import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/edgecape_jax_cache")
def timeit(f, *a, n=5):
    np.asarray(f(*a)); ts=[]
    for i in range(n):
        t0=time.perf_counter(); np.asarray(f(*a)); ts.append(time.perf_counter()-t0)
    return min(ts)
rng = np.random.default_rng(0)
for (m,k,n) in [(131072,384,1536),(8192,8192,8192),(131072,384,384)]:
    a = jnp.asarray(rng.normal(size=(m,k)), jnp.bfloat16)
    b = jnp.asarray(rng.normal(size=(k,n)), jnp.bfloat16)
    f = jax.jit(lambda a,b: (a@b).sum())
    dt = timeit(f,a,b)
    print("matmul %dx%dx%d: %.2f ms -> %.1f TFLOP/s" % (m,k,n, dt*1e3, 2*m*k*n/dt/1e12))
# chained to remove dispatch overhead
a = jnp.asarray(rng.normal(size=(131072,384)), jnp.bfloat16)
w1 = jnp.asarray(rng.normal(size=(384,1536)), jnp.bfloat16)*0.01
w2 = jnp.asarray(rng.normal(size=(1536,384)), jnp.bfloat16)*0.01
def chain(a,w1,w2):
    x = a
    for _ in range(12):
        x = (x@w1)@w2
    return x.sum()
f = jax.jit(chain)
dt = timeit(f,a,w1,w2)
fl = 12*2*131072*384*1536*2
print("chained mlp x12: %.2f ms -> %.1f TFLOP/s" % (dt*1e3, fl/dt/1e12))
