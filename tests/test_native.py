import numpy as np
import pytest

from edgecape_tpu.data import native
from edgecape_tpu.ops import affine, heatmap, warp

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


def test_native_warp_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(0)
    images, mats, invs = [], [], []
    for i in range(5):
        h, w = int(rng.integers(60, 140)), int(rng.integers(60, 140))
        images.append(rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8))
        center = np.array([w / 2 + rng.normal(), h / 2 + rng.normal()])
        scale = np.array([0.4, 0.4]) * (1 + 0.2 * rng.random())
        rot = float(rng.uniform(-30, 30))
        m = affine.get_affine_transform(center, scale, rot, (64, 64))
        mats.append(m)
        invs.append(warp.invert_affine(m))
    out = native.warp_normalize_batch(
        images, np.stack(invs), (64, 64),
        np.zeros(3, np.float32), np.ones(3, np.float32))
    for i in range(5):
        ref = cv2.warpAffine(images[i], mats[i], (64, 64),
                             flags=cv2.INTER_LINEAR).astype(np.float32)
        ref /= 255.0
        diff = np.abs(out[i] - ref)
        # cv2 uses 5-bit fixed-point bilinear; small quantization expected
        assert diff.max() <= 4.0 / 255.0, diff.max()
        assert np.median(diff) <= 1.0 / 255.0


def test_native_warp_imagenet_normalize():
    img = np.full((32, 32, 3), 128, np.uint8)
    ident = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], np.float32)
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    out = native.warp_normalize_batch([img], ident[None], (32, 32), mean,
                                      std)
    expected = (128 / 255.0 - mean) / std
    np.testing.assert_allclose(out[0, 5, 5], expected, atol=1e-5)


def test_native_heatmaps_match_numpy():
    rng = np.random.default_rng(1)
    n, k = 4, 20
    joints = rng.uniform(-20, 250, size=(n, k, 2)).astype(np.float32)
    vis = (rng.uniform(size=(n, k)) > 0.3).astype(np.float32)
    for sigma in (1.0, 2.0):
        tgt, wgt = native.msra_heatmaps_batch(joints, vis, (64, 64),
                                              (224.0, 224.0), sigma)
        for i in range(n):
            ref_t, ref_w = heatmap.render_msra(joints[i], vis[i], (64, 64),
                                               (224, 224), sigma)
            np.testing.assert_allclose(wgt[i], ref_w[:, 0])
            np.testing.assert_allclose(tgt[i], ref_t, atol=1e-5)


def test_native_udp_heatmaps_match_numpy():
    rng = np.random.default_rng(2)
    n, k = 4, 20
    joints = rng.uniform(-20, 250, size=(n, k, 2)).astype(np.float32)
    vis = (rng.uniform(size=(n, k)) > 0.3).astype(np.float32)
    for sigma in (1.0, 2.0, 2.5):  # 2.5 exercises the fractional window
        tgt, wgt = native.udp_heatmaps_batch(joints, vis, (64, 64),
                                             (224.0, 224.0), sigma)
        for i in range(n):
            ref_t, ref_w = heatmap.render_udp(joints[i], vis[i], (64, 64),
                                              (224, 224), sigma)
            np.testing.assert_allclose(wgt[i], ref_w[:, 0])
            np.testing.assert_allclose(tgt[i], ref_t, atol=1e-5)


def test_collate_native_udp_matches_python(tmp_path):
    """Regression: collate_native used to silently ignore use_udp=True
    (always MSRA + standard affine)."""
    import os

    from edgecape_tpu.config import DataConfig
    from edgecape_tpu.data import synthetic
    from edgecape_tpu.data.mp100 import MP100Dataset

    ann = synthetic.generate(str(tmp_path), num_classes=2,
                             images_per_class=6, image_size=128, seed=5)
    cfg = DataConfig(ann_file=ann,
                     img_prefix=os.path.join(str(tmp_path), "images"),
                     num_shots=1, num_queries=2, num_episodes=1,
                     image_size=56, heatmap_size=16, max_kpt=16, sigma=1.0,
                     use_udp=True)
    ds = MP100Dataset(cfg, mode="test")
    idx = [0, 1, 2]
    ref = ds.collate(idx)
    fast = ds.collate_native(idx)
    assert np.abs(fast.img_q - ref.img_q).max() < 0.1
    np.testing.assert_allclose(fast.target_q, ref.target_q, atol=1e-5)
    np.testing.assert_array_equal(fast.weight_q, ref.weight_q)
    np.testing.assert_allclose(fast.joints_q, ref.joints_q, atol=1e-3)
    np.testing.assert_allclose(fast.target_s, ref.target_s, atol=1e-5)


def test_collate_native_matches_python(tmp_path):
    from edgecape_tpu.config import DataConfig
    from edgecape_tpu.data import synthetic
    from edgecape_tpu.data.mp100 import MP100Dataset
    import os

    ann = synthetic.generate(str(tmp_path), num_classes=2,
                             images_per_class=6, image_size=128, seed=3)
    cfg = DataConfig(ann_file=ann,
                     img_prefix=os.path.join(str(tmp_path), "images"),
                     num_shots=1, num_queries=2, num_episodes=1,
                     image_size=56, heatmap_size=16, max_kpt=16, sigma=1.0)
    ds = MP100Dataset(cfg, mode="test")
    idx = [0, 1, 2]
    ref = ds.collate(idx)
    fast = ds.collate_native(idx)
    # warp differs only by cv2 fixed-point quantization
    assert np.abs(fast.img_q - ref.img_q).max() < 0.1
    assert np.median(np.abs(fast.img_q - ref.img_q)) < 0.02
    np.testing.assert_allclose(fast.target_q, ref.target_q, atol=1e-5)
    np.testing.assert_array_equal(fast.weight_q, ref.weight_q)
    np.testing.assert_allclose(fast.joints_q, ref.joints_q, atol=1e-3)
    np.testing.assert_array_equal(fast.binary_adj, ref.binary_adj)
    np.testing.assert_allclose(fast.meta["query_center"],
                               ref.meta["query_center"])
    np.testing.assert_allclose(fast.meta["query_scale"],
                               ref.meta["query_scale"])
