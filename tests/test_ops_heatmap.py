import numpy as np

from edgecape_tpu.ops import heatmap


def _reference_msra(joints_3d, joints_3d_visible, image_size, heatmap_size,
                    sigma):
    """Direct transcription of the reference algorithm's *semantics*
    (loop form) used as a golden for the vectorized implementation."""
    num_joints = len(joints_3d)
    W, H = heatmap_size
    target_weight = np.zeros((num_joints, 1), dtype=np.float32)
    target = np.zeros((num_joints, H, W), dtype=np.float32)
    tmp_size = sigma * 3
    for j in range(num_joints):
        target_weight[j] = joints_3d_visible[j]
        feat_stride = np.asarray(image_size) / [W, H]
        mu_x = int(joints_3d[j][0] / feat_stride[0] + 0.5)
        mu_y = int(joints_3d[j][1] / feat_stride[1] + 0.5)
        ul = [int(mu_x - tmp_size), int(mu_y - tmp_size)]
        br = [int(mu_x + tmp_size + 1), int(mu_y + tmp_size + 1)]
        if ul[0] >= W or ul[1] >= H or br[0] < 0 or br[1] < 0:
            target_weight[j] = 0
        if target_weight[j] > 0.5:
            size = 2 * tmp_size + 1
            x = np.arange(0, size, 1, np.float32)
            y = x[:, None]
            x0 = y0 = size // 2
            g = np.exp(-((x - x0) ** 2 + (y - y0) ** 2) / (2 * sigma ** 2))
            g_x = max(0, -ul[0]), min(br[0], W) - ul[0]
            g_y = max(0, -ul[1]), min(br[1], H) - ul[1]
            img_x = max(0, ul[0]), min(br[0], W)
            img_y = max(0, ul[1]), min(br[1], H)
            target[j][img_y[0]:img_y[1], img_x[0]:img_x[1]] = \
                g[g_y[0]:g_y[1], g_x[0]:g_x[1]]
    return target, target_weight


def test_msra_matches_reference_loop():
    rng = np.random.default_rng(0)
    K = 32
    joints = rng.uniform(-30, 260, size=(K, 2)).astype(np.float32)
    vis = (rng.uniform(size=K) > 0.3).astype(np.float32)
    for sigma in (1, 2):
        ours_t, ours_w = heatmap.render_msra(joints, vis, (64, 64),
                                             (224, 224), sigma)
        ref_t, ref_w = _reference_msra(joints, vis, (224, 224), (64, 64),
                                       sigma)
        np.testing.assert_allclose(ours_w, ref_w)
        np.testing.assert_allclose(ours_t, ref_t, atol=1e-6)


def test_msra_jnp_matches_numpy():
    rng = np.random.default_rng(1)
    B, K = 3, 16
    joints = rng.uniform(-10, 240, size=(B, K, 2)).astype(np.float32)
    vis = (rng.uniform(size=(B, K)) > 0.3).astype(np.float32)
    t_j, w_j = heatmap.render_msra_jnp(joints, vis, (64, 64), (224, 224), 1)
    for b in range(B):
        t_n, w_n = heatmap.render_msra(joints[b], vis[b], (64, 64),
                                       (224, 224), 1)
        np.testing.assert_allclose(np.asarray(t_j)[b], t_n, atol=1e-5)
        np.testing.assert_allclose(np.asarray(w_j)[b], w_n, atol=1e-6)


def test_peak_value_is_one():
    joints = np.array([[112.0, 112.0]])
    vis = np.array([1.0])
    t, w = heatmap.render_msra(joints, vis, (64, 64), (224, 224), 2)
    assert t.max() == 1.0
    assert w[0, 0] == 1.0


def test_udp_jnp_matches_numpy():
    import jax.numpy as jnp
    rng = np.random.default_rng(5)
    B, K = 2, 12
    joints = rng.uniform(-10, 240, size=(B, K, 2)).astype(np.float32)
    vis = (rng.uniform(size=(B, K)) > 0.3).astype(np.float32)
    t_j, w_j = heatmap.render_udp_jnp(jnp.asarray(joints), jnp.asarray(vis),
                                      (64, 64), (224, 224), 2.0)
    for b in range(B):
        t_n, w_n = heatmap.render_udp(joints[b], vis[b], (64, 64),
                                      (224, 224), 2.0)
        np.testing.assert_allclose(np.asarray(t_j)[b], t_n, atol=1e-5)
        np.testing.assert_allclose(np.asarray(w_j)[b], w_n, atol=1e-6)
