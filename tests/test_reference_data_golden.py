"""Episode/eval protocol parity against the EXECUTABLE reference dataset
classes.

The reference's TransformerPoseDataset / TestPoseDataset (and their bases)
are imported from /root/reference/EdgeCape/datasets/datasets/mp100/ via
reference_shim.load_reference_datasets() and run over the same synthetic
COCO json as our MP100Dataset. Asserted bit-identical: db records, cat2obj,
class-balanced train pairing (same global seeds), seeded val/test episode
draws, and evaluate() output (PCK@thr/mPCK/NME/AUC/EPE) on the same
synthetic predictions — replacing the transcription-based parity claims for
the data/eval layer (the last subsystem that had no executable golden).

Missing-image semantics are covered explicitly: the reference TRAIN db
build skips records whose image file is absent (transformer_dataset.py:202)
while the TEST db build never stats the filesystem (test_dataset.py:201);
ours reproduces both via check_files='skip' / False and defaults to raising.
"""

import os
import random
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from edgecape_tpu.config import DataConfig  # noqa: E402
from edgecape_tpu.data import synthetic  # noqa: E402
from edgecape_tpu.data.coco import CocoIndex  # noqa: E402
from edgecape_tpu.data.mp100 import MP100Dataset, build_db  # noqa: E402
from edgecape_tpu.eval.runner import (compute_metrics,  # noqa: E402
                                      compute_metrics_reference)
from reference_shim import load_reference_datasets  # noqa: E402

# reference shipped data_cfg (configs/test/1shot_split1.py:73-79)
DATA_CFG = dict(image_size=[224, 224], heatmap_size=[64, 64],
                num_output_channels=1, num_joints=1,
                dataset_channel=[[0]], inference_channel=[0])
MAX_KPT = 100


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("mp100_refgolden")
    ann = synthetic.generate(str(root), num_classes=6, images_per_class=24,
                             image_size=128, seed=11)
    return str(root), ann


def _ours(ann, root, *, mode, shots=1, episodes=3, check_files=True):
    cfg = DataConfig(ann_file=ann, img_prefix=os.path.join(root, "images"),
                     num_shots=shots, num_queries=15, num_episodes=episodes,
                     max_kpt=MAX_KPT)
    return MP100Dataset(cfg, mode=mode, check_files=check_files)


def _ref_test(ref, ann, root, *, shots=1, episodes=3):
    return ref.TestPoseDataset(
        ann_file=ann, img_prefix=os.path.join(root, "images"),
        data_cfg=dict(DATA_CFG), pipeline=[], valid_class_ids=None,
        max_kpt_num=MAX_KPT, num_shots=shots, num_queries=15,
        num_episodes=episodes, test_mode=True)


def _ref_train(ref, ann, root, *, shots=1, test_mode=False, episodes=3):
    return ref.TransformerPoseDataset(
        ann_file=ann, img_prefix=os.path.join(root, "images"),
        data_cfg=dict(DATA_CFG), pipeline=[], valid_class_ids=None,
        max_kpt_num=MAX_KPT, num_shots=shots, num_queries=15,
        num_episodes=episodes, test_mode=test_mode)


def _assert_db_equal(ours_db, ref_db, *, keys=("image_file", "rotation",
                                               "bbox_score", "category_id",
                                               "cat_kpt_num", "bbox_id",
                                               "skeleton")):
    assert len(ours_db) == len(ref_db)
    for a, b in zip(ours_db, ref_db):
        for k in keys:
            assert a[k] == b[k], k
        np.testing.assert_array_equal(a["joints_3d"], b["joints_3d"])
        np.testing.assert_array_equal(a["joints_3d_visible"],
                                      b["joints_3d_visible"])
        np.testing.assert_allclose(a["center"], b["center"], rtol=1e-6)
        np.testing.assert_allclose(a["scale"], b["scale"], rtol=1e-6)
        np.testing.assert_allclose(a["bbox"], b["bbox"], rtol=1e-6)


def test_db_and_cat2obj_match_reference(synth_root):
    root, ann = synth_root
    ref = load_reference_datasets()
    r = _ref_test(ref, ann, root)
    o = _ours(ann, root, mode="test")
    _assert_db_equal(o.db, r.db)
    assert o.cat2obj == r.cat2obj


def test_db_ragged_kpt_num_matches_reference(synth_root):
    """max_kpt_num=None: per-category joint counts (ragged db)."""
    root, ann = synth_root
    ref = load_reference_datasets()
    r = ref.TestPoseDataset(
        ann_file=ann, img_prefix=os.path.join(root, "images"),
        data_cfg=dict(DATA_CFG), pipeline=[], valid_class_ids=None,
        max_kpt_num=None, num_shots=1, num_queries=15, num_episodes=1,
        test_mode=True)
    db, cat2obj = build_db(CocoIndex(ann), os.path.join(root, "images"),
                           (224, 224), None)
    _assert_db_equal(db, r.db)
    assert cat2obj == r.cat2obj


@pytest.mark.parametrize("shots,episodes", [(1, 3), (5, 2)])
def test_seeded_test_episodes_match_reference(synth_root, shots, episodes):
    """make_paired_samples (random.seed(1)/np.random.seed(0) + CPython
    random.sample) vs our make_episodes — bit-identical index tuples."""
    root, ann = synth_root
    ref = load_reference_datasets()
    r = _ref_test(ref, ann, root, shots=shots, episodes=episodes)
    o = _ours(ann, root, mode="test", shots=shots, episodes=episodes)
    np.testing.assert_array_equal(o.paired_samples, r.paired_samples)
    # val-style: TransformerPoseDataset with test_mode=True uses the same
    # seeded sampler (transformer_dataset.py:85-98)
    rv = _ref_train(ref, ann, root, shots=shots, test_mode=True,
                    episodes=episodes)
    ov = _ours(ann, root, mode="val", shots=shots, episodes=episodes)
    np.testing.assert_array_equal(ov.paired_samples, rv.paired_samples)


@pytest.mark.parametrize("shots", [1, 5])
def test_train_episode_resampling_matches_reference(synth_root, shots):
    """random_paired_samples: class-balanced (shots+1)-tuples from the
    GLOBAL random state + np.random.shuffle. Seeding both stacks the same
    way must give identical epochs, including the per-epoch re-draw."""
    root, ann = synth_root
    ref = load_reference_datasets()
    random.seed(123)
    np.random.seed(456)
    r = _ref_train(ref, ann, root, shots=shots)
    random.seed(123)
    np.random.seed(456)
    o = _ours(ann, root, mode="train", shots=shots)
    np.testing.assert_array_equal(o.paired_samples, r.paired_samples)
    # epoch hook: both resample again from the same (advanced) stream
    # state — snapshot/restore so each consumes an identical stream
    st_r, st_np = random.getstate(), np.random.get_state()
    r.random_paired_samples()
    random.setstate(st_r)
    np.random.set_state(st_np)
    o.resample_episodes()
    np.testing.assert_array_equal(o.paired_samples, r.paired_samples)


def _synthetic_predictions(ds, seed=7):
    """Noisy-GT predictions per paired sample: [N, K, 3] with scores."""
    rng = np.random.default_rng(seed)
    preds = []
    for pair in ds.paired_samples:
        item = ds.db[pair[-1]]
        gt = np.array(item["joints_3d"], np.float32)[:, :2]
        noise = rng.normal(0, 12.0, size=gt.shape).astype(np.float32)
        score = rng.uniform(0.2, 1.0, size=(gt.shape[0], 1)).astype(
            np.float32)
        preds.append(np.concatenate([gt + noise, score], axis=1))
    return preds


def _ref_outputs(ref_ds, preds, batch=7):
    """Chunk predictions into the reference evaluate() outputs format."""
    out = []
    n = len(preds)
    for s in range(0, n, batch):
        idxs = list(range(s, min(s + batch, n)))
        boxes, paths = [], []
        for i in idxs:
            item = ref_ds.db[ref_ds.paired_samples[i][-1]]
            c, sc = item["center"], item["scale"]
            boxes.append([c[0], c[1], sc[0], sc[1],
                          float(np.prod(sc * 200.0)), 1.0])
            paths.append(item["image_file"])
        out.append({"preds": np.stack([preds[i] for i in idxs]),
                    "boxes": np.array(boxes, np.float32),
                    "image_paths": paths,
                    "bbox_ids": idxs})
    return out


def test_test_evaluate_matches_reference(synth_root, tmp_path):
    """TestPoseDataset.evaluate (mask construction from query AND all
    supports, bbox-max-side thresholds, sort/dedup by bbox_id, per-sample
    metric aggregation) vs our compute_metrics AND the per-sample oracle —
    identical numbers for PCK@5thr/mPCK/NME/AUC/EPE, 1- and 5-shot."""
    root, ann = synth_root
    ref = load_reference_datasets()
    for shots in (1, 5):
        r = _ref_test(ref, ann, root, shots=shots, episodes=2)
        o = _ours(ann, root, mode="test", shots=shots, episodes=2)
        np.testing.assert_array_equal(o.paired_samples, r.paired_samples)
        preds = _synthetic_predictions(o)
        got_ref = r.evaluate(_ref_outputs(r, preds), str(tmp_path),
                             metric=["PCK", "NME", "AUC", "EPE"])
        records = [{"keypoints": p} for p in preds]
        for got_ours in (compute_metrics(o, records,
                                         ["PCK", "NME", "AUC", "EPE"]),
                         compute_metrics_reference(
                             o, records, ["PCK", "NME", "AUC", "EPE"])):
            for key, val in got_ref.items():
                assert key in got_ours, key
                np.testing.assert_allclose(got_ours[key], val, rtol=1e-6,
                                           err_msg=key)


def test_train_evaluate_matches_reference(synth_root, tmp_path):
    """TransformerPoseDataset.evaluate: single PCK@0.2 over train-mode
    episodes (transformer_base_dataset.py:121-126)."""
    root, ann = synth_root
    ref = load_reference_datasets()
    random.seed(9)
    np.random.seed(9)
    r = _ref_train(ref, ann, root)
    random.seed(9)
    np.random.seed(9)
    o = _ours(ann, root, mode="train")
    np.testing.assert_array_equal(o.paired_samples, r.paired_samples)
    preds = _synthetic_predictions(o)
    got_ref = r.evaluate(_ref_outputs(r, preds), str(tmp_path),
                         metric="PCK")
    got_ours = compute_metrics(o, [{"keypoints": p} for p in preds],
                               ["PCK"])
    np.testing.assert_allclose(got_ours["PCK"], got_ref["PCK"], rtol=1e-6)


def test_missing_file_semantics_match_reference(tmp_path):
    """Partial image set: reference train db SKIPS missing files
    (shifting obj_ids) while the test db keeps them. check_files='skip' /
    False reproduce each bit-for-bit; the default raises."""
    root = str(tmp_path)
    ann = synthetic.generate(root, num_classes=3, images_per_class=20,
                             image_size=64, seed=3)
    # delete two images
    imgs = sorted(os.listdir(os.path.join(root, "images")))
    for name in (imgs[4], imgs[31]):
        os.remove(os.path.join(root, "images", name))

    ref = load_reference_datasets()
    r_train = ref.TransformerPoseDataset(
        ann_file=ann, img_prefix=os.path.join(root, "images"),
        data_cfg=dict(DATA_CFG), pipeline=[], valid_class_ids=None,
        max_kpt_num=MAX_KPT, num_shots=1, num_queries=15, num_episodes=1,
        test_mode=True)
    r_test = ref.TestPoseDataset(
        ann_file=ann, img_prefix=os.path.join(root, "images"),
        data_cfg=dict(DATA_CFG), pipeline=[], valid_class_ids=None,
        max_kpt_num=MAX_KPT, num_shots=1, num_queries=15, num_episodes=1,
        test_mode=True)
    assert len(r_train.db) == len(r_test.db) - 2

    o_skip = _ours(ann, root, mode="test", episodes=1, check_files="skip")
    _assert_db_equal(o_skip.db, r_train.db)
    assert o_skip.cat2obj == r_train.cat2obj
    np.testing.assert_array_equal(o_skip.paired_samples,
                                  r_train.paired_samples)

    o_nostat = _ours(ann, root, mode="test", episodes=1, check_files=False)
    _assert_db_equal(o_nostat.db, r_test.db)
    np.testing.assert_array_equal(o_nostat.paired_samples,
                                  r_test.paired_samples)

    with pytest.raises(FileNotFoundError):
        _ours(ann, root, mode="test", episodes=1, check_files=True)
