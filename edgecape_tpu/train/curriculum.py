"""Three-stage curriculum driver.

Behavioral spec: reference run.py:33-103 — stage 1 'base' (GT skeleton
only), stage 2 'base_skeleton' (+learned skeleton, masked supervision),
stage 3 'base_skeleton_bias' (+attention bias, skeleton frozen), each
warm-started from the previous stage's final (or best) checkpoint, then
evaluation of latest and best. Same artifact layout (base/, base_skeleton/,
base_skeleton_bias/, dumped stage configs) — but in-process instead of
subprocess re-invocation.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

from ..config import Config, stage2_config, stage3_config
from ..data.mp100 import MP100Dataset
from . import checkpoint as ck
from .loop import Trainer

STAGES = ("base", "base_skeleton", "base_skeleton_bias")


def _stage_cfg(cfg: Config, stage: str, work_dir: str,
               load_from: Optional[str], ft_epochs: int,
               masking_ratio: float, lamda_masking: float) -> Config:
    if stage == "base":
        out = cfg
    elif stage == "base_skeleton":
        out = stage2_config(cfg, masking_ratio, lamda_masking)
        out = dataclasses.replace(
            out, train=dataclasses.replace(out.train,
                                           total_epochs=ft_epochs))
    elif stage == "base_skeleton_bias":
        out = stage3_config(cfg)
        out = dataclasses.replace(
            out, train=dataclasses.replace(out.train,
                                           total_epochs=ft_epochs))
    else:
        raise ValueError(stage)
    return dataclasses.replace(out, work_dir=work_dir, load_from=load_from,
                               resume_from=None)


def run_curriculum(cfg: Config, work_dir: str, *, best: bool = False,
                   ft_epochs: int = 100, masking_ratio: float = 0.5,
                   lamda_masking: float = 1.0, backbone_params=None,
                   mesh=None, skip_base: bool = False,
                   log_fn=print) -> dict:
    """Returns {stage: final_checkpoint_path} plus 'eval' results."""
    os.makedirs(work_dir, exist_ok=True)
    train_ds = MP100Dataset(cfg.train_data, mode="train")
    val_ds = MP100Dataset(cfg.val_data, mode="val") \
        if cfg.val_data.ann_file else None

    artifacts = {}
    prev_ckpt = None
    stage_dirs = {s: os.path.join(work_dir, s) for s in STAGES}

    for stage in STAGES:
        sdir = stage_dirs[stage]
        if stage == "base" and skip_base:
            # reference run.py comments out stage-1 training (run.py:49-52):
            # the base checkpoint must pre-exist
            prev_ckpt = ck.latest_checkpoint(sdir)
            artifacts[stage] = prev_ckpt
            continue
        scfg = _stage_cfg(cfg, stage, sdir, prev_ckpt,
                          ft_epochs, masking_ratio, lamda_masking)
        scfg.dump(os.path.join(
            work_dir, {"base": "base_config.json",
                       "base_skeleton": "skeleton_config.json",
                       "base_skeleton_bias": "bias_config.json"}[stage]))
        log_fn(f"=== curriculum stage: {stage} ===")
        trainer = Trainer(scfg, train_ds, val_ds,
                          backbone_params=backbone_params, mesh=mesh,
                          log_fn=log_fn)
        backbone_params = trainer.backbone_params
        trainer.fit()
        prev_ckpt = (ck.best_checkpoint(sdir) if best
                     else ck.latest_checkpoint(sdir))
        artifacts[stage] = prev_ckpt

    # final evaluation on latest + best of the last stage (run.py:101-103)
    if cfg.test_data.ann_file:
        from ..api import PoseEstimator
        from ..eval.runner import append_testing_log, run_eval
        final_dir = stage_dirs["base_skeleton_bias"]
        test_cfg = stage3_config(cfg)
        test_ds = MP100Dataset(test_cfg.test_data, mode="test")
        evals = {}
        for name, path in [("latest", ck.latest_checkpoint(final_dir)),
                           ("best", ck.best_checkpoint(final_dir))]:
            if path is None:
                continue
            tree = ck.load_checkpoint(path)
            est = PoseEstimator(test_cfg, backbone_params=backbone_params,
                                head_params=tree["params"], mesh=mesh)
            res = run_eval(test_ds, est,
                           batch_size=cfg.train.batch_size,
                           res_folder=final_dir)
            append_testing_log(work_dir, "bias_config.json", path, res)
            evals[name] = res
        artifacts["eval"] = evals
    return artifacts
