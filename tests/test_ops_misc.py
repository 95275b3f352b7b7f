import jax.numpy as jnp
import numpy as np
import pytest

from edgecape_tpu.ops import graph, pos_enc, softargmax, warp


# ---------------------------------------------------------------- pos_enc
def test_sine_grid_against_torch_semantics():
    torch = pytest.importorskip("torch")
    import math

    h = w = 7
    num_feats = 8
    mask = torch.zeros(1, h, w, dtype=torch.int)
    not_mask = 1 - mask
    y_embed = not_mask.cumsum(1, dtype=torch.float32)
    x_embed = not_mask.cumsum(2, dtype=torch.float32)
    eps, scale = 1e-6, 2 * math.pi
    y_embed = y_embed / (y_embed[:, -1:, :] + eps) * scale
    x_embed = x_embed / (x_embed[:, :, -1:] + eps) * scale
    dim_t = torch.arange(num_feats, dtype=torch.float32)
    dim_t = 10000 ** (2 * (dim_t // 2) / num_feats)
    pos_x = x_embed[:, :, :, None] / dim_t
    pos_y = y_embed[:, :, :, None] / dim_t
    pos_x = torch.stack((pos_x[..., 0::2].sin(), pos_x[..., 1::2].cos()),
                        dim=4).view(1, h, w, -1)
    pos_y = torch.stack((pos_y[..., 0::2].sin(), pos_y[..., 1::2].cos()),
                        dim=4).view(1, h, w, -1)
    ref = torch.cat((pos_y, pos_x), dim=3)[0].numpy()  # [h, w, 2F] channels-last

    ours = np.asarray(pos_enc.sine_grid(h, w, num_feats))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_sine_coords_shape_and_range():
    coords = jnp.array([[[0.0, 0.0], [1.0, 1.0], [0.5, 0.25]]])
    emb = pos_enc.sine_coords(coords, num_feats=128)
    assert emb.shape == (1, 3, 256)
    assert np.all(np.abs(np.asarray(emb)) <= 1.0 + 1e-6)


# ------------------------------------------------------------------ graph
def test_adjacency_from_edges():
    adj = graph.adjacency_from_edges([[0, 1], [1, 2]], 4)
    assert adj[0, 1] == adj[1, 0] == 1
    assert adj[1, 2] == adj[2, 1] == 1
    assert adj.sum() == 4


def test_normalize_adjacency_rows_and_diag():
    adj = jnp.asarray(graph.adjacency_from_edges([[0, 1], [0, 2], [1, 2]], 4))
    invalid = jnp.array([False, False, False, True])
    out = graph.normalize_adjacency(adj[None], invalid[None])
    assert out.shape == (1, 2, 4, 4)
    d = np.asarray(out[0, 0])
    np.testing.assert_allclose(np.diag(d), [1, 1, 1, 0])
    rows = np.asarray(out[0, 1]).sum(-1)
    np.testing.assert_allclose(rows[:3], 1.0, atol=1e-6)
    assert rows[3] == 0.0


def test_markov_hop_stack_powers():
    adj = jnp.asarray(graph.adjacency_from_edges([[0, 1], [1, 2]], 3))[None]
    stack = graph.markov_hop_stack(adj, max_hop=3)
    assert stack.shape == (1, 3, 3, 4)
    np.testing.assert_allclose(np.asarray(stack[0, :, :, 0]), np.eye(3),
                               atol=1e-6)
    # rows of each power are stochastic (valid graph, no isolated nodes)
    for d in range(1, 4):
        np.testing.assert_allclose(
            np.asarray(stack[0, :, :, d]).sum(-1), 1.0, atol=1e-4)


# -------------------------------------------------------------- softargmax
def test_global_soft_argmax_peaked():
    h = w = 16
    sim = np.full((1, 2, h * w), -20.0, dtype=np.float32)
    sim[0, 0, 5 * w + 7] = 20.0   # (x=7, y=5)
    sim[0, 1, 12 * w + 3] = 20.0
    out = np.asarray(softargmax.global_soft_argmax(jnp.asarray(sim), h, w))
    np.testing.assert_allclose(out[0, 0], [(7 + 0.5) / w, (5 + 0.5) / h],
                               atol=1e-3)
    np.testing.assert_allclose(out[0, 1], [(3 + 0.5) / w, (12 + 0.5) / h],
                               atol=1e-3)


def test_local_soft_argmax_matches_torch_reference():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    b, k, h, w = 2, 5, 16, 16
    sim = rng.normal(size=(b, k, h * w)).astype(np.float32)

    # reference semantics (encoder_decoder.py:85-110), re-expressed
    st = torch.from_numpy(sim)
    softm = st.softmax(dim=-1)
    max_pos = torch.argmax(st, dim=-1, keepdim=True)
    max_mask = F.one_hot(max_pos, num_classes=w * h).reshape(b, k, h, w).float()
    local_mask = F.max_pool2d(max_mask, 3, 1, 1).reshape(b, k, w * h, 1)
    local = softm[:, :, :, None] * local_mask
    local = local / (local.sum(dim=-2, keepdim=True) + 1e-10)
    gy, gx = torch.meshgrid(torch.linspace(0.5, h - 0.5, h),
                            torch.linspace(0.5, w - 0.5, w), indexing="ij")
    grid = torch.stack([gx, gy], -1).reshape(1, 1, h * w, 2)
    ref = (local * grid).sum(dim=2) / torch.tensor([w, h], dtype=torch.float32)

    ours = np.asarray(softargmax.local_soft_argmax(jnp.asarray(sim), h, w))
    np.testing.assert_allclose(ours, ref.numpy(), atol=1e-5)


# ------------------------------------------------------------------- warp
def test_warp_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    from edgecape_tpu.ops import affine as aff

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(100, 120, 3)).astype(np.uint8)
    center = np.array([60.0, 50.0])
    scale = np.array([0.5, 0.5])
    for rot in (0.0, 17.0):
        mat = aff.get_affine_transform(center, scale, rot, (64, 64))
        ref = cv2.warpAffine(img, mat, (64, 64), flags=cv2.INTER_LINEAR)
        inv = warp.invert_affine(mat)
        ours = np.asarray(warp.warp_affine_batch(
            jnp.asarray(img)[None], jnp.asarray(inv)[None], (64, 64),
            normalize=False))[0]
        # cv2 uses fixed-point bilinear (5-bit fractions) -> small quantization
        assert np.abs(ours - ref.astype(np.float32)).max() <= 4.0
        assert np.median(np.abs(ours - ref.astype(np.float32))) <= 1.0
