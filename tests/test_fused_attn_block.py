import numpy as np

import jax.numpy as jnp

from edgecape_tpu.ops import fused_attn_block as fab


def _args(b=2, n=257, c=384, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda *sh, s=0.05: jnp.asarray(  # noqa: E731
        rng.normal(size=sh) * s, jnp.float32)
    x = jnp.asarray(rng.normal(size=(b, n, c)), jnp.float32)
    return (x, mk(c, s=1.0), mk(c, s=0.1), mk(c, c), mk(c, s=0.1),
            mk(c, c), mk(c, s=0.1), mk(c, c), mk(c, s=0.1), mk(c, c),
            mk(c, s=0.1), jnp.full(c, 0.1, jnp.float32))


def test_fused_attn_block_matches_reference():
    args = _args()
    ref = np.asarray(fab.reference_attn_block(*args, num_heads=6))
    out = np.asarray(fab.fused_attn_block(*args, num_heads=6,
                                          interpret=True))
    assert np.abs(out - ref).max() < 0.03  # bf16 compute
    assert np.abs(out - ref).mean() < 0.003


def test_fused_attn_block_padded_tokens():
    """Token counts that need padding (257 -> 384) must not leak padded
    keys into real rows."""
    args = _args(b=4, n=130)
    ref = np.asarray(fab.reference_attn_block(*args, num_heads=6))
    out = np.asarray(fab.fused_attn_block(*args, num_heads=6,
                                          interpret=True))
    assert out.shape == ref.shape
    assert np.abs(out - ref).max() < 0.03
