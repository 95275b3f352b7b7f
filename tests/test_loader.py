import os

import numpy as np
import pytest

from edgecape_tpu.config import DataConfig
from edgecape_tpu.data import synthetic
from edgecape_tpu.data.loader import Prefetcher
from edgecape_tpu.data.mp100 import MP100Dataset


@pytest.fixture(scope="module")
def ds(tmp_path_factory):
    root = tmp_path_factory.mktemp("mp100loader")
    ann = synthetic.generate(str(root), num_classes=2, images_per_class=8,
                             image_size=128, seed=7)
    cfg = DataConfig(ann_file=ann,
                     img_prefix=os.path.join(str(root), "images"),
                     num_shots=1, image_size=56, heatmap_size=16,
                     max_kpt=16, sigma=1.0)
    return MP100Dataset(cfg, mode="train")


def test_prefetcher_covers_epoch(ds):
    pf = Prefetcher(ds, batch_size=4, num_workers=3, seed=0)
    batches = list(pf.epoch())
    assert len(batches) == len(ds) // 4 == len(pf)
    seen = [b for batch in batches for b in batch.meta["bbox_id"]]
    assert len(set(seen)) == len(seen)  # no duplicates within an epoch


def test_prefetcher_deterministic(ds):
    def collect(seed):
        pf = Prefetcher(ds, batch_size=4, num_workers=2, seed=seed,
                        masking_ratio=0.5)
        out = []
        for b in pf.epoch():
            out.append((tuple(b.meta["bbox_id"]), b.img_q.sum(),
                        b.rand_mask.sum()))
        return out

    a = collect(3)
    b = collect(3)
    assert a == b
    c = collect(4)
    assert a != c


def test_prefetcher_early_break(ds):
    pf = Prefetcher(ds, batch_size=4, num_workers=2, seed=0)
    it = pf.epoch()
    next(it)
    it.close()  # generator close must not hang or leak threads


def test_prefetcher_matches_direct_collate(ds):
    pf = Prefetcher(ds, batch_size=4, num_workers=1, shuffle=False,
                    use_native=False, seed=0)
    first = next(pf.epoch())
    # shuffle=False: first batch is indices [0,1,2,3] with the same
    # per-SAMPLE rng plan the planner created
    seeds = np.random.default_rng(0).integers(2**63, size=4)
    rngs = [np.random.default_rng(s) for s in seeds]
    ref = ds.collate([0, 1, 2, 3], rng=rngs, masking_ratio=0.0)
    np.testing.assert_allclose(first.img_q, ref.img_q, atol=1e-6)
    np.testing.assert_array_equal(first.weight_q, ref.weight_q)


def test_sharded_prefetcher_slices_match_full(ds):
    """shard=(i, p): each process's batch must be bit-identical to its
    row slice of the unsharded batch — the property that makes sharded
    host collation safe for multi-process training."""
    full = Prefetcher(ds, batch_size=4, num_workers=1, shuffle=True,
                      use_native=False, seed=5, masking_ratio=0.5)
    parts = [Prefetcher(ds, batch_size=4, num_workers=1, shuffle=True,
                        use_native=False, seed=5, masking_ratio=0.5,
                        shard=(i, 2)) for i in range(2)]
    fb = next(full.epoch())
    p0 = next(parts[0].epoch())
    p1 = next(parts[1].epoch())
    assert p0.img_q.shape[0] == p1.img_q.shape[0] == 2
    np.testing.assert_array_equal(fb.img_q[:2], p0.img_q)
    np.testing.assert_array_equal(fb.img_q[2:], p1.img_q)
    np.testing.assert_array_equal(fb.img_s[:2], p0.img_s)
    np.testing.assert_array_equal(fb.rand_mask[:2], p0.rand_mask)
    np.testing.assert_array_equal(fb.rand_mask[2:], p1.rand_mask)
    np.testing.assert_array_equal(fb.joints_q[2:], p1.joints_q)
