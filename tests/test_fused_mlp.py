import numpy as np

import jax.numpy as jnp

from edgecape_tpu.ops import fused_mlp as fm


def _inputs(n=257, c=384, f=1536, seed=0, batch=2):
    rng = np.random.default_rng(seed)
    return (
        jnp.asarray(rng.normal(size=(batch, n, c)), jnp.float32),
        jnp.asarray(rng.normal(size=c), jnp.float32),
        jnp.asarray(rng.normal(size=c) * 0.1, jnp.float32),
        jnp.asarray(rng.normal(size=(c, f)) * 0.05, jnp.float32),
        jnp.asarray(rng.normal(size=f) * 0.1, jnp.float32),
        jnp.asarray(rng.normal(size=(f, c)) * 0.05, jnp.float32),
        jnp.asarray(rng.normal(size=c) * 0.1, jnp.float32),
        jnp.full(c, 0.1, jnp.float32),
    )


def test_fused_ln_mlp_matches_reference():
    args = _inputs()
    ref = np.asarray(fm.reference_ln_mlp(*args))
    out = np.asarray(fm.fused_ln_mlp(*args, interpret=True))
    # bf16 compute + tanh-gelu approximation
    assert np.abs(out - ref).max() < 0.02
    assert np.abs(out - ref).mean() < 0.002


def test_fused_ln_mlp_nonaligned_tokens():
    args = _inputs(n=100, batch=1)
    ref = np.asarray(fm.reference_ln_mlp(*args))
    out = np.asarray(fm.fused_ln_mlp(*args, interpret=True))
    assert out.shape == ref.shape
    assert np.abs(out - ref).max() < 0.02
