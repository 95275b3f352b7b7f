"""Checkpoint save/load/resume with orbax.

Behavioral spec: reference checkpoint flow (SURVEY.md 5): periodic
epoch_N checkpoints + latest pointer (mmcv CheckpointConfig interval=20),
best-PCK checkpoints from the eval hook, auto-resume from latest
(train.py:104-108), and non-strict warm-start across curriculum stages
(run.py load_from with new modules appearing at stages 2/3).
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _abs(path: str) -> str:
    return os.path.abspath(path)


def save_checkpoint(path: str, tree: Any) -> None:
    ckptr = ocp.StandardCheckpointer()
    tree = jax.tree.map(np.asarray, tree)
    ckptr.save(_abs(path), tree, force=True)
    ckptr.wait_until_finished()


def load_checkpoint(path: str, like: Optional[Any] = None) -> Any:
    ckptr = ocp.StandardCheckpointer()
    if like is not None:
        like = jax.tree.map(np.asarray, like)
        return ckptr.restore(_abs(path), target=like)
    return ckptr.restore(_abs(path))


def write_latest(work_dir: str, name: str) -> None:
    with open(os.path.join(work_dir, "latest.json"), "w") as f:
        json.dump({"latest": name}, f)


def latest_checkpoint(work_dir: str) -> Optional[str]:
    """Resolve work_dir/latest.json -> checkpoint dir (auto-resume)."""
    p = os.path.join(work_dir, "latest.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        name = json.load(f)["latest"]
    path = os.path.join(work_dir, name)
    return path if os.path.exists(path) else None


def best_checkpoint(work_dir: str) -> Optional[str]:
    """Reference get_best_model (run.py:22-30): best_* if present, else
    latest. Names are sorted by their numeric epoch (best_PCK_epoch_75 >
    best_PCK_epoch_9), not lexicographically."""
    def epoch_of(name: str) -> int:
        m = re.search(r"(\d+)$", name)
        return int(m.group(1)) if m else -1

    if os.path.isdir(work_dir):
        names = [n for n in os.listdir(work_dir) if n.startswith("best_")]
        if names:
            names.sort(key=epoch_of)
            return os.path.join(work_dir, names[-1])
    return latest_checkpoint(work_dir)


def merge_params(template: Any, loaded: Any) -> Any:
    """Non-strict warm start: overwrite template leaves that exist in
    `loaded` (matching path + shape), keep fresh init elsewhere — the
    load_checkpoint(strict=False) equivalent used between curriculum
    stages."""
    if isinstance(template, dict):
        out = {}
        for k, v in template.items():
            if isinstance(loaded, dict) and k in loaded:
                out[k] = merge_params(v, loaded[k])
            else:
                out[k] = v
        return out
    if loaded is None:
        return template
    t = np.asarray(template)
    l = np.asarray(loaded)
    return loaded if t.shape == l.shape else template
