#!/usr/bin/env python
"""Convert checkpoints between the reference (PyTorch) format and this
framework's orbax format.

  # full reference EdgeCape checkpoint -> head + backbone orbax dirs
  python scripts/convert_checkpoint.py ref2jax edgecape.pth out_dir \
      --stage 3

  # torch-hub DINOv2 -> backbone orbax dir
  python scripts/convert_checkpoint.py dinov2 dinov2_vits14.pth out_dir
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("mode", choices=["ref2jax", "dinov2"])
    p.add_argument("src", help="torch .pth checkpoint")
    p.add_argument("out", help="output directory (orbax)")
    p.add_argument("--stage", type=int, default=3, choices=[1, 2, 3],
                   help="curriculum stage of the reference checkpoint "
                   "(decides which modules exist)")
    p.add_argument("--image-size", type=int, default=224)
    args = p.parse_args()

    import torch

    from edgecape_tpu.utils.runtime import honor_env_platforms
    honor_env_platforms()   # conversion must not require a live TPU

    from edgecape_tpu.config import (Config, ModelConfig, stage2_config,
                                     stage3_config)
    from edgecape_tpu.models import convert, dinov2
    from edgecape_tpu.train import checkpoint as ck

    sd = torch.load(args.src, map_location="cpu", weights_only=False)
    if "state_dict" in sd:
        sd = sd["state_dict"]

    os.makedirs(args.out, exist_ok=True)
    if args.mode == "dinov2":
        params = dinov2.convert_torch_state_dict(sd,
                                                 image_size=args.image_size)
        ck.save_checkpoint(os.path.join(args.out, "backbone"), params)
        print("wrote", os.path.join(args.out, "backbone"))
        return

    cfg = Config(model=ModelConfig(image_size=args.image_size))
    if args.stage >= 2:
        cfg = stage2_config(cfg)
    if args.stage >= 3:
        cfg = stage3_config(cfg)
    head, backbone = convert.convert_full(sd, cfg.model,
                                          image_size=args.image_size)
    ck.save_checkpoint(os.path.join(args.out, "head"),
                       {"params": head, "epoch": -1, "best_pck": 0.0})
    print("wrote", os.path.join(args.out, "head"))
    if backbone is not None:
        ck.save_checkpoint(os.path.join(args.out, "backbone"), backbone)
        print("wrote", os.path.join(args.out, "backbone"))


if __name__ == "__main__":
    main()
