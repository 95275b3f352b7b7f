"""Driver for the 2-process distributed-eval test (run as a subprocess).

Each process initializes the jax.distributed runtime over localhost,
evaluates its shard of the synthetic episodes on its local CPU devices,
and the primary dumps the gathered metrics json. Mirrors what
`test.py --dist-*` does on real multi-host TPU slices.
"""

import argparse
import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault(
    "XLA_FLAGS", "--xla_force_host_platform_device_count=4")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def large_gather_plan(pid: int):
    """(n_local, k_local) for the gather_large mode: ragged record
    counts AND ragged keypoint dims across processes, ~10k records
    total over 3 processes."""
    return 3400 - 7 * pid, 6 + 4 * pid


def large_gather_record(pid: int, i: int, k: int):
    """Deterministic record for (pid, i); every float is a small
    multiple of 2^-3, exactly representable in float32, so the
    gathered output can be asserted bit-identical after json."""
    return {
        "keypoints": [[pid + i * 0.125, float(j), float((i * j) % 7)]
                      for j in range(k)],
        "center": [float(pid), i * 0.5],
        "scale": [0.25, 0.25 + pid],
        "area": 2.0 * pid + i,
        "score": 0.875,
        "image_id": (1 << 40) + pid * 1_000_000 + i,  # >2^32: hi/lo path
        "bbox_id": pid * 100_000 + i,
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--coordinator", required=True)
    p.add_argument("--num-processes", type=int, required=True)
    p.add_argument("--process-id", type=int, required=True)
    p.add_argument("--root", required=True)
    p.add_argument("--ann", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--mode", default="eval",
                   choices=["eval", "train", "gather", "gather_large"])
    args = p.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")

    from edgecape_tpu.parallel import multihost
    multihost.initialize(args.coordinator, args.num_processes,
                         args.process_id)
    assert jax.process_count() == args.num_processes

    if args.mode == "gather":
        # ragged record gather: processes carry DIFFERENT local K and
        # counts; every field must survive the fixed-shape allgather
        from edgecape_tpu.eval.runner import _allgather_records
        pid = args.process_id
        k_local, n_local = 5 + 3 * pid, 2 + pid
        records = [{
            "keypoints": [[float(pid), float(i), float(j)]
                          for j in range(k_local)],
            "center": [1.0 + pid, 2.0],
            "scale": [0.5, 0.5 + i],
            "area": 10.0 * (pid + 1),
            "score": 0.875,
            "image_id": (1 << 40) + pid * 1000 + i,  # >2^32: hi/lo path
            "bbox_id": pid * 100 + i,
        } for i in range(n_local)]
        gathered = _allgather_records(records)
        if pid == 0:
            with open(args.out, "w") as f:
                json.dump(gathered, f)
        return

    if args.mode == "gather_large":
        # scale stress: ~10k records across 3 processes with ragged
        # per-process K AND counts — the fixed-shape gather's first
        # large payload (the 2-process tests use 5 records total).
        # Every value is exactly representable in float32 so the test
        # can assert bit-identical equality after the json round-trip.
        import resource

        from edgecape_tpu.eval.runner import _allgather_records
        pid = args.process_id
        n_local, k_local = large_gather_plan(pid)
        records = [large_gather_record(pid, i, k_local)
                   for i in range(n_local)]
        gathered = _allgather_records(records)
        peak_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
        if pid == 0:
            with open(args.out, "w") as f:
                json.dump({"records": gathered, "peak_rss_mb": peak_mb}, f)
        return

    from edgecape_tpu.config import Config, DataConfig, ModelConfig, \
        TrainConfig
    from edgecape_tpu.data.mp100 import MP100Dataset

    dcfg = DataConfig(ann_file=args.ann,
                      img_prefix=os.path.join(args.root, "images"),
                      num_shots=1, num_queries=2, num_episodes=2,
                      image_size=56, heatmap_size=16, max_kpt=16,
                      sigma=1.0)
    mcfg = ModelConfig(image_size=56, heatmap_size=16, max_kpt=16)

    if args.mode == "eval":
        from edgecape_tpu.api import PoseEstimator
        from edgecape_tpu.eval.runner import run_eval
        from edgecape_tpu.parallel.mesh import make_mesh

        cfg = Config(model=mcfg, test_data=dcfg)
        ds = MP100Dataset(dcfg, mode="test")
        local = jax.local_devices()
        mesh = make_mesh(local) if len(local) > 1 else None
        est = PoseEstimator(cfg, rng=jax.random.PRNGKey(0), mesh=mesh)
        results = run_eval(ds, est, batch_size=6, res_folder=args.out,
                           progress=False, cache_supports=True)
        if multihost.is_primary():
            with open(os.path.join(args.out, "metrics.json"), "w") as f:
                json.dump({k: v for k, v in results.items()
                           if k not in ("eval_seconds", "images_per_sec")},
                          f)
    else:
        from edgecape_tpu.parallel.mesh import make_mesh
        from edgecape_tpu.train.loop import Trainer

        cfg = Config(model=mcfg, train_data=dcfg,
                     train=TrainConfig(batch_size=8, total_epochs=1,
                                       warmup_iters=2, num_workers=0,
                                       ckpt_interval=1, eval_interval=100),
                     work_dir=args.out)
        ds = MP100Dataset(dcfg, mode="train")
        mesh = make_mesh()            # global mesh across both processes
        trainer = Trainer(cfg, ds, None, mesh=mesh)
        state = trainer.fit()
        if multihost.is_primary():
            import numpy as np
            flat = jax.tree.leaves(multihost.to_host(state.params))
            digest = float(sum(np.abs(x).sum() for x in flat))
            with open(os.path.join(args.out, "digest.json"), "w") as f:
                json.dump({"param_l1": digest}, f)


if __name__ == "__main__":
    main()
