import numpy as np
import pytest

from edgecape_tpu.ops import affine


def test_xywh2cs_square():
    c, s = affine.xywh2cs(10, 20, 100, 50, image_size=(224, 224))
    np.testing.assert_allclose(c, [60.0, 45.0])
    # w > h -> h grows to w; scale = (100/200)*1.25
    np.testing.assert_allclose(s, [0.625, 0.625])


def test_affine_matrix_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(0)
    for _ in range(20):
        center = rng.uniform(10, 500, size=2).astype(np.float32)
        scale = rng.uniform(0.2, 3.0, size=2).astype(np.float32)
        rot = float(rng.uniform(-45, 45))
        out_size = (224, 224)
        ours = affine.get_affine_transform(center, scale, rot, out_size)

        # rebuild reference triangles and let cv2 solve
        scale_px = scale * 200.0
        rad = np.pi * rot / 180.0
        sn, cs = np.sin(rad), np.cos(rad)
        src_dir = np.array([0.0 * cs - (-0.5 * scale_px[0]) * sn,
                            0.0 * sn + (-0.5 * scale_px[0]) * cs])
        src = np.zeros((3, 2), np.float32)
        src[0] = center
        src[1] = center + src_dir
        d = src[0] - src[1]
        src[2] = src[1] + np.array([-d[1], d[0]])
        dst = np.zeros((3, 2), np.float32)
        dst[0] = [112.0, 112.0]
        dst[1] = [112.0, 112.0 - 112.0]
        d = dst[0] - dst[1]
        dst[2] = dst[1] + np.array([-d[1], d[0]])
        ref = cv2.getAffineTransform(src, dst)
        np.testing.assert_allclose(ours, ref, atol=1e-3)


def test_inverse_affine_roundtrip():
    center = np.array([123.0, 77.0])
    scale = np.array([1.5, 1.5])
    fwd = affine.get_affine_transform(center, scale, 30.0, (224, 224))
    inv = affine.get_affine_transform(center, scale, 30.0, (224, 224),
                                      inv=True)
    pts = np.random.default_rng(1).uniform(0, 224, size=(10, 2))
    back = affine.affine_transform_points(
        affine.affine_transform_points(pts, inv), fwd)
    np.testing.assert_allclose(back, pts, atol=1e-4)


def test_transform_preds_is_inverse_of_crop():
    # with rot=0, transform_preds must match the inverse crop affine
    center = np.array([300.0, 200.0])
    scale = np.array([1.2, 1.2])
    out_size = (224, 224)
    inv = affine.get_affine_transform(center, scale, 0.0, out_size, inv=True)
    coords = np.random.default_rng(2).uniform(0, 224, size=(7, 2))
    via_affine = affine.affine_transform_points(coords, inv)
    via_preds = affine.transform_preds(coords, center, scale, out_size)
    np.testing.assert_allclose(via_preds, via_affine, atol=1e-3)


def test_transform_preds_batch_matches_single():
    rng = np.random.default_rng(3)
    coords = rng.uniform(0, 224, size=(4, 9, 2))
    centers = rng.uniform(50, 400, size=(4, 2))
    scales = rng.uniform(0.5, 2.0, size=(4, 2))
    batch = affine.transform_preds_batch(coords, centers, scales, (224, 224))
    for i in range(4):
        single = affine.transform_preds(coords[i], centers[i], scales[i],
                                        (224, 224))
        np.testing.assert_allclose(batch[i], single, atol=1e-6)


def test_udp_warp_matrix_properties():
    # box center maps to destination center; box corners map to dst corners
    center = np.array([150.0, 90.0])
    scale_px = np.array([120.0, 80.0])
    out = np.array([223.0, 223.0])  # image_size - 1
    m = affine.get_warp_matrix_udp(0.0, center, out, scale_px)
    c_dst = affine.affine_transform_points(center, m)
    np.testing.assert_allclose(c_dst, out / 2 + 0, atol=1e-6)
    left = affine.affine_transform_points(center - scale_px / 2, m)
    np.testing.assert_allclose(left, [0.0, 0.0], atol=1e-6)
    right = affine.affine_transform_points(center + scale_px / 2, m)
    np.testing.assert_allclose(right, out, atol=1e-6)


def test_udp_transform_preds_inverts_warp():
    center = np.array([150.0, 90.0])
    scale = np.array([0.6, 0.4])
    size = 224
    m = affine.get_warp_matrix_udp(0.0, center, (size - 1.0, size - 1.0),
                                   scale * 200.0)
    pts = np.random.default_rng(0).uniform(50, 250, size=(6, 2))
    warped = affine.affine_transform_points(pts, m)
    back = affine.transform_preds(warped, center, scale, (size, size),
                                  use_udp=True)
    np.testing.assert_allclose(back, pts, atol=1e-4)
