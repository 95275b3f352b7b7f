"""Device mesh + sharding helpers.

TPU-native replacement for the reference's DDP/NCCL layer (SURVEY.md 2.8):
a 1-D `data` mesh with NamedSharding on the batch axis; parameters are
replicated; XLA inserts the gradient psum over ICI. Multi-host extension:
jax.distributed.initialize + the same mesh over all processes' devices.

The model is small (~30M params with the frozen ViT-S backbone) so data
parallelism is the only sharding that pays for itself at MP-100 scale —
tensor/pipeline axes can be added to this mesh without touching call sites
(axis_names is the single source of truth).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None,
              axis_names: Sequence[str] = ("data",)) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    return Mesh(np.array(devices).reshape(shape), axis_names)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Device_put a host pytree with the batch axis sharded."""
    return jax.device_put(tree, batch_sharding(mesh))


def replicate(mesh: Mesh, tree):
    return jax.device_put(tree, replicated(mesh))


def pad_to_multiple(arr: np.ndarray, multiple: int, axis: int = 0):
    """Pad the batch axis so it divides the mesh; returns (padded, n_real)."""
    n = arr.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return arr, n
    pad_width = [(0, 0)] * arr.ndim
    pad_width[axis] = (0, rem)
    return np.pad(arr, pad_width, mode="edge"), n
