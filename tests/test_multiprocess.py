"""Two-process distributed runtime tests (jax.distributed over localhost
CPU): the multi-host eval path (episode sharding + record allgather) and
the multi-host train path (global batch arrays over a cross-process mesh)
must match single-process results.

Reference capability being reproduced: apis/test.py:50-198 multi_gpu_test
+ collect_results, train.py:123-137 init_dist.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from edgecape_tpu.config import Config, DataConfig, ModelConfig
from edgecape_tpu.data import synthetic

pytestmark = pytest.mark.slow  # heavy jit/model suite; excluded by -m 'not slow'

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DRIVER = os.path.join(REPO, "tests", "multiproc_driver.py")


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("mp100mp")
    ann = synthetic.generate(str(root), num_classes=3, images_per_class=8,
                             image_size=128, seed=0)
    return str(root), ann


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _spawn(nproc, root, ann, out, mode):
    port = _free_port()
    procs = []
    for pid in range(nproc):
        env = dict(os.environ)
        env.pop("PYTHONPATH", None)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
        procs.append(subprocess.Popen(
            [sys.executable, DRIVER,
             "--coordinator", f"localhost:{port}",
             "--num-processes", str(nproc), "--process-id", str(pid),
             "--root", root, "--ann", ann, "--out", out, "--mode", mode],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            cwd=REPO))
    outs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(stdout.decode())
    for p, o in zip(procs, outs):
        assert p.returncode == 0, f"rank failed:\n{o[-4000:]}"
    return outs


def _data_cfg(root, ann):
    return DataConfig(ann_file=ann,
                      img_prefix=os.path.join(root, "images"),
                      num_shots=1, num_queries=2, num_episodes=2,
                      image_size=56, heatmap_size=16, max_kpt=16,
                      sigma=1.0)


def test_two_process_eval_matches_single(synth_root, tmp_path):
    root, ann = synth_root
    out = str(tmp_path / "mp_eval")
    os.makedirs(out, exist_ok=True)
    _spawn(2, root, ann, out, "eval")
    with open(os.path.join(out, "metrics.json")) as f:
        dist = json.load(f)

    # single-process baseline, same seed/params/episodes
    import jax
    from edgecape_tpu.api import PoseEstimator
    from edgecape_tpu.data.mp100 import MP100Dataset
    from edgecape_tpu.eval.runner import run_eval

    dcfg = _data_cfg(root, ann)
    cfg = Config(model=ModelConfig(image_size=56, heatmap_size=16,
                                   max_kpt=16), test_data=dcfg)
    ds = MP100Dataset(dcfg, mode="test")
    est = PoseEstimator(cfg, rng=jax.random.PRNGKey(0))
    res = run_eval(ds, est, batch_size=6,
                   res_folder=str(tmp_path / "single"), progress=False,
                   cache_supports=True)
    for k, v in dist.items():
        np.testing.assert_allclose(v, res[k], rtol=1e-4, atol=1e-5,
                                   err_msg=k)


def test_two_process_train_matches_single(synth_root, tmp_path):
    root, ann = synth_root
    out = str(tmp_path / "mp_train")
    os.makedirs(out, exist_ok=True)
    _spawn(2, root, ann, out, "train")
    with open(os.path.join(out, "digest.json")) as f:
        dist = json.load(f)

    import jax
    from edgecape_tpu.config import TrainConfig
    from edgecape_tpu.data.mp100 import MP100Dataset
    from edgecape_tpu.train.loop import Trainer

    dcfg = _data_cfg(root, ann)
    cfg = Config(model=ModelConfig(image_size=56, heatmap_size=16,
                                   max_kpt=16),
                 train_data=dcfg,
                 train=TrainConfig(batch_size=8, total_epochs=1,
                                   warmup_iters=2, num_workers=0,
                                   ckpt_interval=1, eval_interval=100),
                 work_dir=str(tmp_path / "single_train"))
    ds = MP100Dataset(dcfg, mode="train")
    trainer = Trainer(cfg, ds, None, mesh=None)
    state = trainer.fit()
    flat = jax.tree.leaves(jax.tree.map(np.asarray, state.params))
    digest = float(sum(np.abs(x).sum() for x in flat))
    np.testing.assert_allclose(dist["param_l1"], digest, rtol=1e-4)


def test_three_process_large_ragged_gather(synth_root, tmp_path):
    """~10k records over THREE processes with ragged per-process K and
    counts: the fixed-shape gather's first large payload. Asserts the
    gathered records are bit-identical to the per-process inputs
    (process-major order) and that peak RSS stays bounded — a quadratic
    or copy-amplified gather would blow past the cap."""
    from tests.multiproc_driver import (large_gather_plan,
                                        large_gather_record)

    root, ann = synth_root
    out = str(tmp_path / "gathered_large.json")
    _spawn(3, root, ann, out, "gather_large")
    with open(out) as f:
        payload = json.load(f)
    gathered = payload["records"]

    expected = []
    for pid in range(3):
        n_local, k_local = large_gather_plan(pid)
        k_max = max(large_gather_plan(p)[1] for p in range(3))
        for i in range(n_local):
            r = large_gather_record(pid, i, k_local)
            kp = np.zeros((k_max, 3), np.float32)
            kp[:k_local] = r["keypoints"]
            r["keypoints"] = kp.tolist()
            expected.append(r)
    assert len(gathered) == len(expected) == sum(
        large_gather_plan(p)[0] for p in range(3))
    for got, want in zip(gathered, expected):
        assert got == want
    # the whole payload is ~10k x 14 x 3 floats (~2MB gathered); a sane
    # gather on CPU jax stays far below this generous cap
    assert payload["peak_rss_mb"] < 4096, payload["peak_rss_mb"]


def test_two_process_ragged_record_gather(synth_root, tmp_path):
    """_allgather_records with DIFFERENT per-process K and record counts:
    keypoints zero-pad to the global max instead of raising on the row
    assignment, counts interleave correctly, and >2^32 image ids survive
    the hi/lo int32 gather."""
    root, ann = synth_root
    out = str(tmp_path / "gathered.json")
    _spawn(2, root, ann, out, "gather")
    with open(out) as f:
        gathered = json.load(f)

    # process 0: 2 records of K=5; process 1: 3 records of K=8
    assert len(gathered) == 5
    k_max = 8
    for r in gathered:
        assert len(r["keypoints"]) == k_max
    for pid, base, n, k_local in ((0, 0, 2, 5), (1, 2, 3, 8)):
        for i in range(n):
            r = gathered[base + i]
            kp = np.asarray(r["keypoints"])
            # real rows carry [pid, i, j]; padded rows are zero
            np.testing.assert_array_equal(
                kp[:k_local],
                [[pid, i, j] for j in range(k_local)])
            np.testing.assert_array_equal(kp[k_local:], 0.0)
            assert r["image_id"] == (1 << 40) + pid * 1000 + i
            assert r["bbox_id"] == pid * 100 + i
            assert r["center"] == [1.0 + pid, 2.0]
            assert r["scale"] == [0.5, 0.5 + i]
            assert r["area"] == 10.0 * (pid + 1)
            assert r["score"] == 0.875
