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


def _ref_generator(**kw):
    import sys as _sys
    import os as _os
    _sys.path.insert(0, _os.path.dirname(__file__))
    import reference_shim
    mod = reference_shim.load_reference_pipeline()
    return mod.TopDownGenerateTargetFewShot(**kw)


def _ref_results(joints, vis, image_size, heatmap_size):
    k = joints.shape[0]
    j3 = np.zeros((k, 3), np.float32)
    j3[:, :2] = joints
    v3 = np.zeros((k, 3), np.float32)
    v3[:, 0] = vis
    v3[:, 1] = vis
    return {
        "joints_3d": j3, "joints_3d_visible": v3,
        "ann_info": {
            "image_size": np.array([image_size, image_size]),
            "heatmap_size": np.array([heatmap_size, heatmap_size]),
            "joint_weights": np.ones((k, 1), np.float32),
            "use_different_joint_weights": False,
            "num_joints": k,
        },
    }


def test_multi_sigma_matches_reference_generator():
    """render_msra_multi vs the EXECUTABLE reference generator
    (top_down_transform.py:330-345 multi-sigma stacking)."""
    rng = np.random.default_rng(3)
    k, size, hs = 9, 224, 64
    joints = rng.uniform(-10, size + 10, size=(k, 2)).astype(np.float32)
    vis = (rng.uniform(size=k) > 0.25).astype(np.float32)
    sigmas = [1.0, 2.0, 2.5]
    gen = _ref_generator(sigma=sigmas, encoding="MSRA")
    out = gen(_ref_results(joints, vis, size, hs))
    ref_t, ref_w = out["target"], out["target_weight"]
    got_t, got_w = heatmap.render_msra_multi(joints, vis, (hs, hs),
                                             (size, size), sigmas)
    assert ref_t.shape == got_t.shape == (3, k, hs, hs)
    np.testing.assert_allclose(got_t, ref_t, atol=1e-6)
    np.testing.assert_array_equal(got_w, ref_w)


def test_udp_combined_matches_reference_generator():
    """render_udp_combined vs the EXECUTABLE reference generator
    (top_down_transform.py:286-315 UDP CombinedTarget)."""
    rng = np.random.default_rng(5)
    k, size, hs = 7, 224, 64
    joints = rng.uniform(0, size, size=(k, 2)).astype(np.float32)
    vis = (rng.uniform(size=k) > 0.25).astype(np.float32)
    gen = _ref_generator(sigma=2, encoding="UDP",
                         target_type="CombinedTarget")
    out = gen(_ref_results(joints, vis, size, hs))
    ref_t, ref_w = out["target"], out["target_weight"]
    got_t, got_w = heatmap.render_udp_combined(joints, vis, (hs, hs),
                                               (size, size))
    assert ref_t.shape == got_t.shape == (3 * k, hs, hs)
    np.testing.assert_allclose(got_t, ref_t, atol=1e-5)
    np.testing.assert_array_equal(got_w, ref_w)


def test_msra_fractional_sigma_matches_reference_generator():
    """sigma=2.5 (fractional 3*sigma): asymmetric window + shifted anchor
    (reference top_down_transform.py:178-189) vs the executable golden."""
    rng = np.random.default_rng(11)
    k, size, hs = 12, 224, 64
    joints = rng.uniform(-15, size + 15, size=(k, 2)).astype(np.float32)
    vis = (rng.uniform(size=k) > 0.2).astype(np.float32)
    gen = _ref_generator(sigma=2.5, encoding="MSRA")
    out = gen(_ref_results(joints, vis, size, hs))
    got_t, got_w = heatmap.render_msra(joints, vis, (hs, hs), (size, size),
                                       2.5)
    np.testing.assert_allclose(got_t, out["target"], atol=1e-6)
    np.testing.assert_array_equal(got_w, out["target_weight"])
    # device path agrees too
    dt, dw = heatmap.render_msra_jnp(joints, vis, (hs, hs), (size, size),
                                     2.5)
    np.testing.assert_allclose(np.asarray(dt), out["target"], atol=1e-5)


def test_udp_fractional_sigma_matches_reference_generator():
    rng = np.random.default_rng(13)
    k, size, hs = 12, 224, 64
    joints = rng.uniform(-15, size + 15, size=(k, 2)).astype(np.float32)
    vis = (rng.uniform(size=k) > 0.2).astype(np.float32)
    gen = _ref_generator(sigma=2.5, encoding="UDP",
                         target_type="GaussianHeatMap")
    out = gen(_ref_results(joints, vis, size, hs))
    got_t, got_w = heatmap.render_udp(joints, vis, (hs, hs), (size, size),
                                      2.5)
    np.testing.assert_allclose(got_t, out["target"], atol=1e-5)
    np.testing.assert_array_equal(got_w, out["target_weight"])
    dt, dw = heatmap.render_udp_jnp(joints, vis, (hs, hs), (size, size),
                                    2.5)
    np.testing.assert_allclose(np.asarray(dt), out["target"], atol=1e-5)


def test_msra_unbiased_matches_reference_generator():
    """render_msra_unbiased vs the EXECUTABLE reference generator with
    unbiased_encoding=True (top_down_transform.py:140-163): continuous
    sub-pixel center, full-map gaussian, float window-bound check."""
    rng = np.random.default_rng(17)
    k, size, hs = 12, 224, 64
    joints = rng.uniform(-15, size + 15, size=(k, 2)).astype(np.float32)
    vis = (rng.uniform(size=k) > 0.2).astype(np.float32)
    for sigma in (2.0, 2.5):
        gen = _ref_generator(sigma=sigma, encoding="MSRA",
                             unbiased_encoding=True)
        out = gen(_ref_results(joints, vis, size, hs))
        got_t, got_w = heatmap.render_msra_unbiased(
            joints, vis, (hs, hs), (size, size), sigma)
        np.testing.assert_allclose(got_t, out["target"], atol=1e-6)
        np.testing.assert_array_equal(got_w, out["target_weight"])
        dt, dw = heatmap.render_msra_unbiased_jnp(
            joints, vis, (hs, hs), (size, size), sigma)
        np.testing.assert_allclose(np.asarray(dt), out["target"], atol=1e-5)
        np.testing.assert_array_equal(np.asarray(dw)[:, 0],
                                      out["target_weight"][:, 0])
