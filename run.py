#!/usr/bin/env python
"""Full-pipeline CLI: 3-stage training curriculum + final evaluation.

Mirrors the reference run.py surface (--config/--work_dir/--best/
--ft_epochs/--masking_ratio/--lamda_masking and the base/base_skeleton/
base_skeleton_bias artifact layout) but drives the stages in-process
instead of re-invoking train.py subprocesses.
"""

from __future__ import annotations

import argparse


def main():
    p = argparse.ArgumentParser(description="Run the training pipeline")
    p.add_argument("--config", required=True)
    p.add_argument("--work_dir", "--work-dir", dest="work_dir",
                   required=True)
    p.add_argument("--best", action="store_true",
                   help="warm-start each stage from the best (not latest) "
                   "checkpoint")
    p.add_argument("--ft_epochs", type=int, default=100)
    p.add_argument("--masking_ratio", type=float, default=0.5)
    p.add_argument("--lamda_masking", type=float, default=1.0)
    p.add_argument("--skip-base", action="store_true",
                   help="assume the base stage checkpoint already exists "
                   "(the reference pipeline's default behavior)")
    p.add_argument("--backbone-ckpt", default=None)
    p.add_argument("--cfg-options", nargs="+", default=[])
    args = p.parse_args()

    import jax

    from edgecape_tpu.utils.runtime import honor_env_platforms
    honor_env_platforms()

    from edgecape_tpu.config import Config
    from edgecape_tpu.parallel.mesh import make_mesh
    from edgecape_tpu.train.curriculum import run_curriculum
    from edgecape_tpu.models.convert import load_backbone

    cfg = Config.from_file(args.config).override(args.cfg_options)
    backbone = load_backbone(args.backbone_ckpt, cfg.model.image_size)
    mesh = make_mesh() if jax.device_count() > 1 else None
    artifacts = run_curriculum(
        cfg, args.work_dir, best=args.best, ft_epochs=args.ft_epochs,
        masking_ratio=args.masking_ratio, lamda_masking=args.lamda_masking,
        backbone_params=backbone, mesh=mesh, skip_base=args.skip_base)
    for k, v in artifacts.items():
        print(k, ":", v)


if __name__ == "__main__":
    main()
