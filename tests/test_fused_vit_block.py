import numpy as np

import jax.numpy as jnp

from edgecape_tpu.ops import fused_vit_block as fvb


def _args(b=2, n=257, c=384, f=1536, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda *sh, s=0.05: jnp.asarray(  # noqa: E731
        rng.normal(size=sh) * s, jnp.float32)
    x = jnp.asarray(rng.normal(size=(b, n, c)), jnp.float32)
    return (x,
            mk(c, s=1.0), mk(c, s=0.1),            # ln1
            mk(c, c), mk(c, s=0.1),                # q
            mk(c, c), mk(c, s=0.1),                # k
            mk(c, c), mk(c, s=0.1),                # v
            mk(c, c), mk(c, s=0.1),                # proj
            jnp.full(c, 0.1, jnp.float32),         # ls1
            mk(c, s=1.0), mk(c, s=0.1),            # ln2
            mk(c, f), mk(f, s=0.1),                # fc1
            mk(f, c), mk(c, s=0.1),                # fc2
            jnp.full(c, 0.1, jnp.float32))         # ls2


def test_fused_vit_block_matches_two_kernel_reference():
    args = _args()
    ref = np.asarray(fvb.reference_vit_block(*args, num_heads=6))
    out = np.asarray(fvb.fused_vit_block(*args, num_heads=6,
                                         interpret=True))
    assert np.abs(out - ref).max() < 0.05  # bf16 compute, two residuals
    assert np.abs(out - ref).mean() < 0.005


def test_fused_vit_block_padded_tokens():
    """Token counts that need sublane padding (130 -> 136) must not leak
    padded keys into real rows."""
    args = _args(b=4, n=130)
    ref = np.asarray(fvb.reference_vit_block(*args, num_heads=6))
    out = np.asarray(fvb.fused_vit_block(*args, num_heads=6,
                                         interpret=True))
    assert out.shape == ref.shape
    assert np.abs(out - ref).max() < 0.05


def test_fused_vit_block_odd_batch_padding():
    """b not divisible by the row group: wrapper pads and slices back."""
    args = _args(b=3, seed=3)
    ref = np.asarray(fvb.reference_vit_block(*args, num_heads=6))
    out = np.asarray(fvb.fused_vit_block(*args, num_heads=6,
                                         interpret=True))
    assert out.shape == ref.shape
    assert np.abs(out - ref).max() < 0.05


def _two_blocks(seed=0, **kw):
    a = _args(seed=seed, **kw)
    b = _args(seed=seed + 100, **kw)
    return a[0], tuple(a[1:]), tuple(b[1:])


def test_fused_vit_block2_bit_matches_composition():
    """Two blocks per program must be BIT-identical to two single-block
    calls (the intermediate is rounded to bf16 in-register exactly like
    the composition's HBM boundary)."""
    x, blk_a, blk_b = _two_blocks()
    xb = x.astype(jnp.bfloat16)  # the fast_forward activation dtype
    one = fvb.fused_vit_block(xb, *blk_a, num_heads=6, interpret=True)
    two = fvb.fused_vit_block(one, *blk_b, num_heads=6, interpret=True)
    fused = fvb.fused_vit_block2(xb, blk_a, blk_b, num_heads=6,
                                 interpret=True)
    np.testing.assert_array_equal(np.asarray(fused, np.float32),
                                  np.asarray(two, np.float32))


def test_fused_vit_block2_padded_tokens():
    x, blk_a, blk_b = _two_blocks(b=4, n=130, seed=5)
    xb = x.astype(jnp.bfloat16)
    one = fvb.fused_vit_block(xb, *blk_a, num_heads=6, interpret=True)
    two = fvb.fused_vit_block(one, *blk_b, num_heads=6, interpret=True)
    fused = fvb.fused_vit_block2(xb, blk_a, blk_b, num_heads=6,
                                 interpret=True)
    np.testing.assert_array_equal(np.asarray(fused, np.float32),
                                  np.asarray(two, np.float32))


def test_fast_forward_pair_blocks_bit_matches():
    """dinov2.fast_forward(pair_blocks=True) == pair_blocks=False output
    bit-for-bit on a small 2-block backbone (interpret mode on CPU)."""
    import jax

    from edgecape_tpu.models import dinov2

    cfg = dinov2.DinoV2Config(depth=2)
    params = jax.jit(lambda r: dinov2.init_params(
        r, image_size=56, cfg=cfg))(jax.random.PRNGKey(0))
    img = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 56, 56, 3)), jnp.float32)
    base = np.asarray(dinov2.fast_forward(params, img, cfg))
    paired = np.asarray(dinov2.fast_forward(params, img, cfg,
                                            pair_blocks=True))
    np.testing.assert_array_equal(paired, base)
