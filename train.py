#!/usr/bin/env python
"""Train CLI.

Mirrors the reference train.py surface (argparse flags, deterministic
seeding, auto-resume from the work dir, linear LR scaling by device count,
config dump into the work dir) on the TPU-native stack: jax.sharding data
parallelism instead of DDP/NCCL, one process for all local devices.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import random

import numpy as np


from edgecape_tpu.models.convert import load_backbone  # noqa: E402


def parse_args():
    p = argparse.ArgumentParser(description="Train EdgeCape-TPU")
    p.add_argument("--config", required=True, help="config file (.py "
                   "exporting `config: edgecape_tpu.config.Config`)")
    p.add_argument("--work-dir", "--work_dir", dest="work_dir", default=None)
    p.add_argument("--resume-from", dest="resume_from", default=None)
    p.add_argument("--load-from", dest="load_from", default=None)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--backbone-ckpt", default=None,
                   help="converted DINOv2 params (orbax dir) or torch-hub "
                   ".pth to convert on the fly")
    p.add_argument("--autoscale-lr", action="store_true",
                   help="linearly scale lr by #devices/8")
    p.add_argument("--cfg-options", nargs="+", default=[],
                   help="dotted overrides, e.g. model.learn_skeleton=true")
    # multi-host launch (reference train.py:61-65 dist launchers): one
    # process per host, jax.distributed instead of NCCL init_dist
    p.add_argument("--dist-coordinator", default=None,
                   help="coordinator address host:port for multi-process "
                   "runs")
    p.add_argument("--dist-num-processes", type=int, default=None)
    p.add_argument("--dist-process-id", type=int, default=None)
    return p.parse_args()


def main():
    args = parse_args()
    # determinism (reference train.py:157-169)
    random.seed(args.seed)
    np.random.seed(args.seed)

    import jax

    from edgecape_tpu.utils.runtime import honor_env_platforms
    honor_env_platforms()

    from edgecape_tpu.config import Config
    from edgecape_tpu.data.mp100 import MP100Dataset
    from edgecape_tpu.parallel import multihost
    from edgecape_tpu.parallel.mesh import make_mesh
    from edgecape_tpu.train.loop import Trainer

    multihost.initialize(args.dist_coordinator, args.dist_num_processes,
                         args.dist_process_id)

    cfg = Config.from_file(args.config).override(args.cfg_options)
    if args.work_dir:
        cfg = dataclasses.replace(cfg, work_dir=args.work_dir)
    if args.resume_from:
        cfg = dataclasses.replace(cfg, resume_from=args.resume_from)
    if args.load_from:
        cfg = dataclasses.replace(cfg, load_from=args.load_from)
    n_dev = jax.device_count()
    if args.autoscale_lr:
        train = dataclasses.replace(cfg.train,
                                    lr=cfg.train.lr * n_dev / 8.0)
        cfg = dataclasses.replace(cfg, train=train)

    os.makedirs(cfg.work_dir, exist_ok=True)
    if multihost.is_primary():
        cfg.dump(os.path.join(cfg.work_dir, "config.json"))

    from edgecape_tpu.data.compose import build_train_dataset
    train_ds = build_train_dataset(cfg.train_data)
    val_ds = (MP100Dataset(cfg.val_data, mode="val")
              if cfg.val_data.ann_file else None)
    mesh = make_mesh() if n_dev > 1 else None
    backbone = load_backbone(args.backbone_ckpt, cfg.model.image_size)
    if backbone is None:
        print("WARNING: no --backbone-ckpt given; using randomly "
              "initialized DINOv2 weights")

    trainer = Trainer(cfg, train_ds, val_ds, backbone_params=backbone,
                      mesh=mesh)
    trainer.fit()


if __name__ == "__main__":
    main()
