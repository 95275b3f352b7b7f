import dataclasses
import os

import numpy as np
import pytest

from edgecape_tpu.config import Config, DataConfig, ModelConfig
from edgecape_tpu.data import synthetic
from edgecape_tpu.data.mp100 import MP100Dataset


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("mp100synth")
    ann = synthetic.generate(str(root), num_classes=3, images_per_class=8,
                             image_size=128, seed=0)
    return str(root), ann


def _data_cfg(root, ann, **kw):
    defaults = dict(ann_file=ann, img_prefix=os.path.join(root, "images"),
                    num_shots=1, num_queries=2, num_episodes=2,
                    image_size=56, heatmap_size=16, max_kpt=16, sigma=1.0)
    defaults.update(kw)
    return DataConfig(**defaults)


def test_dataset_build_and_episodes(synth_root):
    root, ann = synth_root
    cfg = _data_cfg(root, ann)
    ds = MP100Dataset(cfg, mode="test")
    assert len(ds.db) == 24
    # 3 classes x 2 episodes x 2 queries
    assert len(ds) == 12
    # seeded: a second dataset generates identical episodes
    ds2 = MP100Dataset(cfg, mode="test")
    np.testing.assert_array_equal(ds.paired_samples, ds2.paired_samples)
    # supports differ from query within an episode
    for pair in ds.paired_samples:
        assert pair[-1] not in pair[:-1]


def test_train_resample_changes(synth_root):
    root, ann = synth_root
    ds = MP100Dataset(_data_cfg(root, ann), mode="train")
    import random
    random.seed(123)
    first = ds.paired_samples.copy()
    ds.resample_episodes()
    assert first.shape == ds.paired_samples.shape
    assert not np.array_equal(first, ds.paired_samples)


def test_collate_shapes_and_masks(synth_root):
    root, ann = synth_root
    cfg = _data_cfg(root, ann)
    ds = MP100Dataset(cfg, mode="test")
    batch = ds.collate([0, 1, 2], rng=np.random.default_rng(0))
    assert batch.img_s.shape == (3, 1, 56, 56, 3)
    assert batch.img_q.shape == (3, 56, 56, 3)
    assert batch.target_s.shape == (3, 1, 16, 16, 16)
    assert batch.weight_q.shape == (3, 16)
    assert batch.binary_adj.shape == (3, 16, 16)
    # adjacency is symmetric with at least the chain edges
    assert (batch.binary_adj == batch.binary_adj.transpose(0, 2, 1)).all()
    assert batch.binary_adj.sum() > 0
    # padded joints (beyond cat_kpt_num) are invisible
    for bi, pair in enumerate(batch.meta["pair"]):
        n = ds.db[pair[-1]]["cat_kpt_num"]
        assert batch.weight_q[bi, n:].sum() == 0


def test_rand_mask_ratio(synth_root):
    root, ann = synth_root
    cfg = _data_cfg(root, ann)
    ds = MP100Dataset(cfg, mode="test")
    np.random.seed(0)
    batch = ds.collate([0, 1], rng=np.random.default_rng(0),
                       masking_ratio=0.5)
    for bi in range(2):
        joint_w = batch.weight_s[bi].prod(axis=0)
        visible = int(joint_w.sum())
        masked = int((joint_w - batch.rand_mask[bi] * joint_w).sum())
        assert masked == int(visible * 0.5)


@pytest.mark.slow
def test_end_to_end_eval_random_weights(synth_root):
    """Full pipeline: synthetic COCO -> episodes -> backbone+head forward ->
    decode -> metrics. Random weights, so only protocol invariants are
    checked (not accuracy)."""
    import jax
    from edgecape_tpu.api import PoseEstimator
    from edgecape_tpu.eval import runner

    root, ann = synth_root
    dcfg = _data_cfg(root, ann)
    model_cfg = ModelConfig(image_size=56, heatmap_size=16, max_kpt=16)
    cfg = Config(model=model_cfg, test_data=dcfg)
    ds = MP100Dataset(dcfg, mode="test")
    est = PoseEstimator(cfg, rng=jax.random.PRNGKey(0))
    results = runner.run_eval(ds, est, batch_size=6,
                              res_folder="/tmp/ec_eval_test",
                              progress=False)
    for key in ["PCK@0.2", "mPCK", "NME", "AUC", "EPE", "PCK"]:
        assert key in results, key
        assert np.isfinite(results[key])
    assert 0 <= results["PCK"] <= 1
    assert os.path.exists("/tmp/ec_eval_test/result_keypoints.json")


def test_metrics_perfect_prediction(synth_root):
    """Predicting the GT exactly gives PCK=1, EPE=0."""
    root, ann = synth_root
    dcfg = _data_cfg(root, ann)
    ds = MP100Dataset(dcfg, mode="test")
    from edgecape_tpu.eval.runner import compute_metrics
    records = []
    for i, pair in enumerate(ds.paired_samples):
        item = ds.db[pair[-1]]
        kp = np.asarray(item["joints_3d"]).copy()
        kp[:, 2] = 1.0
        records.append({"keypoints": kp.tolist(), "bbox_id": i})
    res = compute_metrics(ds, records, ("PCK", "NME", "AUC", "EPE"))
    assert res["PCK@0.2"] == 1.0
    assert res["EPE"] == 0.0


def test_metrics_vectorized_matches_oracle(synth_root):
    """The vectorized compute_metrics must agree with the per-record
    oracle path (compute_metrics_reference) on noisy predictions with
    invisible joints and tiny/degenerate bboxes."""
    root, ann = synth_root
    dcfg = _data_cfg(root, ann)
    ds = MP100Dataset(dcfg, mode="test")
    from edgecape_tpu.eval.runner import (compute_metrics,
                                          compute_metrics_reference)
    rng = np.random.default_rng(7)
    records = []
    for i, pair in enumerate(ds.paired_samples):
        item = ds.db[pair[-1]]
        kp = np.asarray(item["joints_3d"], dtype=np.float64).copy()
        kp[:, :2] += rng.normal(scale=30.0, size=kp[:, :2].shape)
        kp[:, 2] = 1.0
        records.append({"keypoints": kp.tolist(), "bbox_id": i})
    # degenerate bbox on one query: thr <= 0 excludes the whole record
    ds.db[ds.paired_samples[0][-1]]["bbox"] = np.array([0, 0, 0, 0],
                                                       dtype=np.float32)
    got = compute_metrics(ds, records, ("PCK", "NME", "AUC", "EPE"))
    want = compute_metrics_reference(ds, records,
                                     ("PCK", "NME", "AUC", "EPE"))
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_allclose(got[k], want[k], rtol=1e-6, atol=1e-7,
                                   err_msg=k)


def test_cached_eval_matches_uncached(synth_root):
    """Support-context caching must be output-identical to the per-query
    path (same params, same episodes)."""
    import jax
    from edgecape_tpu.api import PoseEstimator
    from edgecape_tpu.eval import runner

    root, ann = synth_root
    dcfg = _data_cfg(root, ann)
    model_cfg = ModelConfig(image_size=56, heatmap_size=16, max_kpt=16,
                            learn_skeleton=True)
    cfg = Config(model=model_cfg, test_data=dcfg)
    ds = MP100Dataset(dcfg, mode="test")
    est = PoseEstimator(cfg, rng=jax.random.PRNGKey(0))
    r1 = runner.run_eval(ds, est, batch_size=6,
                         res_folder="/tmp/ec_eval_u", progress=False)
    r2 = runner.run_eval(ds, est, batch_size=6,
                         res_folder="/tmp/ec_eval_c", progress=False,
                         cache_supports=True)
    import json
    with open("/tmp/ec_eval_u/result_keypoints.json") as f:
        a = json.load(f)
    with open("/tmp/ec_eval_c/result_keypoints.json") as f:
        b = json.load(f)
    assert len(a) == len(b)
    for ra, rb in zip(a, b):
        assert ra["bbox_id"] == rb["bbox_id"]
        np.testing.assert_allclose(ra["keypoints"], rb["keypoints"],
                                   atol=2e-3)
    for key in ["PCK", "mPCK", "EPE"]:
        assert abs(r1[key] - r2[key]) < 1e-6 or \
            abs(r1[key] - r2[key]) / max(abs(r1[key]), 1e-9) < 0.02
    # decode-vs-device attribution (bench.py value_disk_split) ships on
    # the cached path only
    for key in ["host_collate_seconds", "device_wait_seconds",
                "dispatch_seconds", "first_call_seconds"]:
        assert key in r2 and r2[key] >= 0.0, key
        assert key not in r1, key
    # the one-time jit trace+compile is booked under first_call_seconds,
    # not smeared into the steady-state dispatch/device keys
    assert r2["first_call_seconds"] > 0.0


@pytest.mark.slow
def test_cached_eval_five_shot(synth_root):
    """5-shot episodic eval through the cached path: shapes, grouping, and
    protocol invariants."""
    import jax
    from edgecape_tpu.api import PoseEstimator
    from edgecape_tpu.eval import runner

    root, ann = synth_root
    dcfg = _data_cfg(root, ann, num_shots=5, num_queries=2, num_episodes=1)
    model_cfg = ModelConfig(image_size=56, heatmap_size=16, max_kpt=16,
                            learn_skeleton=True)
    cfg = Config(model=model_cfg, test_data=dcfg)
    ds = MP100Dataset(dcfg, mode="test")
    groups = ds.support_groups()
    assert all(len(sup) == 5 for sup, _ in groups)
    est = PoseEstimator(cfg, rng=jax.random.PRNGKey(0))
    res = runner.run_eval(ds, est, batch_size=4,
                          res_folder="/tmp/ec_eval_5shot", progress=False,
                          cache_supports=True)
    assert np.isfinite(res["PCK"]) and 0 <= res["PCK"] <= 1


def test_pin_query_images(synth_root):
    root, ann = synth_root
    base = MP100Dataset(_data_cfg(root, ann), mode="test")
    # pin the first two distinct query file names
    names = [os.path.basename(base.db[p[-1]]["image_file"])
             for p in base.paired_samples][:2]
    cfg = _data_cfg(root, ann, pin_query_images=tuple(set(names)))
    pinned = MP100Dataset(cfg, mode="test")
    assert 0 < len(pinned) < len(base)
    for p in pinned.paired_samples:
        assert os.path.basename(pinned.db[p[-1]]["image_file"]) in set(names)


def test_repeat_and_concat_datasets(synth_root):
    """Reference build_dataset surface (builder.py:36-55): RepeatDataset
    and ConcatDataset wrappers compose with the collate/Prefetcher
    interface and reproduce the underlying datasets' batches."""
    from edgecape_tpu.data.compose import (ConcatDataset, RepeatDataset,
                                           build_train_dataset)

    root, ann = synth_root
    cfg = _data_cfg(root, ann)
    base = MP100Dataset(cfg, mode="test")

    rep = RepeatDataset(base, 3)
    assert len(rep) == 3 * len(base)
    b1 = base.collate([1, 2], rng=None, masking_ratio=0.0)
    b2 = rep.collate([1 + len(base), 2 + 2 * len(base)], rng=None,
                     masking_ratio=0.0)
    np.testing.assert_array_equal(b1.img_q, b2.img_q)
    np.testing.assert_array_equal(b1.joints_q, b2.joints_q)

    other = MP100Dataset(cfg, mode="test")
    cat = ConcatDataset([base, other])
    assert len(cat) == 2 * len(base)
    # a batch spanning both children, in interleaved order
    idx = [0, len(base) + 1, 2, len(base) + 3]
    got = cat.collate(idx, rng=None, masking_ratio=0.0)
    want0 = base.collate([0, 2], rng=None, masking_ratio=0.0)
    want1 = other.collate([1, 3], rng=None, masking_ratio=0.0)
    np.testing.assert_array_equal(got.img_q[0], want0.img_q[0])
    np.testing.assert_array_equal(got.img_q[2], want0.img_q[1])
    np.testing.assert_array_equal(got.img_q[1], want1.img_q[0])
    np.testing.assert_array_equal(got.img_q[3], want1.img_q[1])
    assert got.meta["query_image_file"][1] == \
        want1.meta["query_image_file"][0]

    built = build_train_dataset(dataclasses.replace(
        cfg, extra_ann_files=[ann], repeat_times=2))
    base_train = MP100Dataset(cfg, mode="train")
    assert len(built) == 4 * len(base_train)
    built.resample_episodes()   # passthrough works


@pytest.mark.slow  # 45s of jit: dtype-drift invariant, slow-suite only
def test_bf16_head_close_to_fp32(synth_root):
    """head_dtype='bfloat16' (the production eval fast path) must stay
    within sub-pixel distance of the fp32 path: coords agree to ~0.5px at
    56px input (bf16 resolution), far below any PCK threshold."""
    import jax
    from edgecape_tpu.api import PoseEstimator

    root, ann = synth_root
    dcfg = _data_cfg(root, ann)
    mcfg = ModelConfig(image_size=56, heatmap_size=16, max_kpt=16)
    cfg32 = Config(model=mcfg, test_data=dcfg)
    ds = MP100Dataset(dcfg, mode="test")
    groups = ds.support_groups()[:2]
    support, query, _ = ds.collate_group(groups)

    est32 = PoseEstimator(cfg32, rng=jax.random.PRNGKey(0))
    p32, _ = est32.forward_cached(support, query)
    cfg16 = Config(model=dataclasses.replace(mcfg,
                                             head_dtype="bfloat16"),
                   test_data=dcfg)
    est16 = PoseEstimator(cfg16, backbone_params=est32.backbone_params,
                          head_params=est32.head_params)
    p16, _ = est16.forward_cached(support, query)
    assert str(p16.dtype) == "float32"
    # compare only valid keypoints: padded slots carry arbitrary coords
    # (mask-dominated tokens under random weights flip local-softargmax
    # windows at any precision change)
    valid = (support["vis_s"].prod(axis=1) > 0)[query["group"]]  # [Nq, K]
    d = np.abs(np.asarray(p16) - np.asarray(p32))[valid]
    # Under RANDOM weights the similarity map is noise, so the local
    # 3x3-softargmax window can legitimately jump between near-tied peaks
    # at any precision change (same would happen fp32-vs-fp64). Assert
    # sub-pixel agreement in distribution instead of max: median and p90
    # tight, window-jump outliers rare.
    assert np.median(d) < 2e-3, np.median(d)
    assert np.quantile(d, 0.9) < 0.01, np.quantile(d, 0.9)
    assert (d > 0.02).mean() < 0.1, (d > 0.02).mean()


def test_pckh_unavailable_warns_and_omits(synth_root):
    """PCKh with no head_size annotations must warn and omit the keys,
    never report a misleading 0.0 (synthetic data carries no head_size)."""
    root, ann = synth_root
    ds = MP100Dataset(_data_cfg(root, ann), mode="test")
    from edgecape_tpu.eval.runner import compute_metrics
    records = []
    for i, pair in enumerate(ds.paired_samples):
        kp = np.asarray(ds.db[pair[-1]]["joints_3d"]).copy()
        kp[:, 2] = 1.0
        records.append({"keypoints": kp.tolist(), "bbox_id": i})
    with pytest.warns(RuntimeWarning, match="PCKh"):
        res = compute_metrics(ds, records, ("PCK", "PCKh"))
    assert not any(k.startswith("PCKh") for k in res)
    assert res["PCK@0.2"] == 1.0  # other metrics unaffected


def test_pckh_with_head_size(synth_root):
    """With head_size present, perfect predictions give PCKh=1 and no
    warning."""
    import warnings

    root, ann = synth_root
    ds = MP100Dataset(_data_cfg(root, ann), mode="test")
    from edgecape_tpu.eval.runner import compute_metrics
    records = []
    for i, pair in enumerate(ds.paired_samples):
        ds.db[pair[-1]]["head_size"] = 24.0
        kp = np.asarray(ds.db[pair[-1]]["joints_3d"]).copy()
        kp[:, 2] = 1.0
        records.append({"keypoints": kp.tolist(), "bbox_id": i})
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        res = compute_metrics(ds, records, ("PCK", "PCKh"))
    assert res["PCKh@0.2"] == 1.0
    assert res["PCKh"] == res["PCKh@0.2"]
