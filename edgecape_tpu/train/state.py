"""Optimizer, LR schedule, and curriculum freezing.

Behavioral spec: reference train recipe (configs/train/1shot_split1.py:13-26
Adam lr=1e-5, linear warmup 1000 iters ratio 1e-3, step decay [160, 180];
apis/train.py optimizer hooks) and the freeze sets of head.py:133-141.

Freezing is an optax.multi_transform mask (set_to_zero on frozen subtrees)
— the functional equivalent of requires_grad_(False): activations still
flow, updates don't.
"""

from __future__ import annotations

from typing import Optional

import jax
import optax

from ..config import TrainConfig

FREEZE_SETS = {
    # reference head.py:133-136 — stage 3 freezes the skeleton branch and
    # the input projections
    "skeleton": ("skeleton", "input_proj", "query_proj"),
    # reference head.py:137-141 — freeze the prediction stack instead
    "prediction": ("decoder", "enc0", "enc1", "enc2", "enc3", "enc4",
                   "enc5", "proposal_gen", "mask_token"),
}


def lr_schedule(cfg: TrainConfig, steps_per_epoch: int):
    """Linear warmup (warmup_ratio -> 1) over warmup_iters steps, then step
    decay by lr_gamma at the configured epoch boundaries."""
    boundaries = {int(e * steps_per_epoch): cfg.lr_gamma for e in cfg.lr_step}
    base = optax.piecewise_constant_schedule(cfg.lr, boundaries)

    def schedule(step):
        warm = jax.numpy.minimum(step / max(cfg.warmup_iters, 1), 1.0)
        factor = cfg.warmup_ratio + (1.0 - cfg.warmup_ratio) * warm
        return base(step) * factor

    return schedule


def make_optimizer(cfg: TrainConfig, steps_per_epoch: int,
                   params, model_freeze: Optional[str] = None):
    sched = lr_schedule(cfg, steps_per_epoch)
    chain = []
    if cfg.grad_clip is not None:
        chain.append(optax.clip_by_global_norm(cfg.grad_clip))
    chain.append(optax.adam(sched))
    tx = optax.chain(*chain)

    if model_freeze:
        frozen_roots = FREEZE_SETS[model_freeze]

        def label(path, _):
            return "frozen" if path[0].key in frozen_roots else "train"

        labels = jax.tree_util.tree_map_with_path(label, params)
        tx = optax.multi_transform(
            {"train": tx, "frozen": optax.set_to_zero()}, labels)
    return tx, sched
