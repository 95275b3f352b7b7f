#!/usr/bin/env python
"""Evaluation CLI.

Mirrors the reference test.py surface: config + checkpoint -> seeded
episodic MP-100 evaluation, PCK@{thresholds}/mPCK/NME/AUC/EPE, results json
and a testing_log.txt append. Batched on TPU (the reference runs bs=1).
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import random

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="Evaluate EdgeCape-TPU")
    p.add_argument("config")
    p.add_argument("checkpoint", nargs="?", default=None,
                   help="orbax checkpoint dir (omit for random weights)")
    p.add_argument("--work-dir", dest="work_dir", default=None)
    p.add_argument("--batch-size", type=int, default=240)
    p.add_argument("--no-cache-supports", action="store_true",
                   help="disable per-episode support-context caching "
                   "(slower; identical outputs)")
    p.add_argument("--backbone-ckpt", default=None)
    p.add_argument("--strict-parity", action="store_true",
                   help="bit-exact fp32 XLA eval (no Pallas kernels, no "
                   "bf16 casts) — the reference-checkpoint PCK bisection "
                   "mode; the reference evaluates fp32 by default "
                   "(reference test.py:121-127)")
    p.add_argument("--cfg-options", nargs="+", default=[])
    # multi-host eval (reference multi_gpu_test, apis/test.py:50-198):
    # each process evaluates its episode shard on its local devices and
    # records are allgathered before metric computation
    p.add_argument("--dist-coordinator", default=None)
    p.add_argument("--dist-num-processes", type=int, default=None)
    p.add_argument("--dist-process-id", type=int, default=None)
    return p.parse_args()


def main():
    args = parse_args()
    random.seed(0)
    np.random.seed(0)

    import jax

    from edgecape_tpu.utils.runtime import honor_env_platforms
    honor_env_platforms()

    from edgecape_tpu.api import PoseEstimator
    from edgecape_tpu.config import Config
    from edgecape_tpu.data.mp100 import MP100Dataset
    from edgecape_tpu.eval.runner import append_testing_log, run_eval
    from edgecape_tpu.parallel import multihost
    from edgecape_tpu.parallel.mesh import make_mesh
    from edgecape_tpu.train import checkpoint as ck

    multihost.initialize(args.dist_coordinator, args.dist_num_processes,
                         args.dist_process_id)

    cfg = Config.from_file(args.config).override(args.cfg_options)
    if args.strict_parity:
        cfg = dataclasses.replace(cfg, model=dataclasses.replace(
            cfg.model, use_flash=False, compute_dtype="float32",
            head_dtype="float32", train_backbone_fast=False))
    if args.work_dir:
        cfg = dataclasses.replace(cfg, work_dir=args.work_dir)
    work_dir = cfg.work_dir
    os.makedirs(work_dir, exist_ok=True)

    ds = MP100Dataset(cfg.test_data, mode="test")

    head_params = None
    if args.checkpoint:
        tree = ck.load_checkpoint(args.checkpoint)
        head_params = tree.get("params", tree)

    from edgecape_tpu.models.convert import load_backbone
    backbone = load_backbone(args.backbone_ckpt, cfg.model.image_size)

    # eval parallelism is per-process: each process drives its LOCAL
    # devices over its episode shard; results meet in the host allgather
    local = jax.local_devices()
    mesh = make_mesh(local) if len(local) > 1 else None
    est = PoseEstimator(cfg, backbone_params=backbone,
                        head_params=head_params, mesh=mesh)
    results = run_eval(ds, est, batch_size=args.batch_size,
                       res_folder=work_dir,
                       cache_supports=not args.no_cache_supports)
    if multihost.is_primary():
        for k, v in results.items():
            print(f"{k}: {v}")
    append_testing_log(work_dir, os.path.basename(args.config),
                       args.checkpoint or "<random>", results)


if __name__ == "__main__":
    main()
