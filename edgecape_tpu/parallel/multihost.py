"""Multi-host utilities.

TPU-native replacement for the reference's NCCL result-gathering hacks
(apis/test.py:94-198 — tmpdir names broadcast as uint8 CUDA tensors,
pickled results through all_gather): fixed-shape array gathers via
jax.experimental.multihost_utils, plus distributed runtime init.

Single-process fallback: every function is a no-op/identity when only one
process is present, so the same code path runs everywhere.
"""

from __future__ import annotations

from typing import Any, Optional

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize wrapper (idempotent, single-host safe)."""
    if num_processes in (None, 1) and coordinator_address is None:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def process_count() -> int:
    return jax.process_count()


def is_primary() -> bool:
    return jax.process_index() == 0


def allgather(tree: Any) -> Any:
    """Gather fixed-shape host arrays from all processes (replaces the
    reference's pickle-over-NCCL collect_results_*)."""
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils
    return multihost_utils.process_allgather(tree)


def broadcast(tree: Any) -> Any:
    """Broadcast process 0's host arrays to everyone."""
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils
    return multihost_utils.broadcast_one_to_all(tree)


def shard_range(n: int) -> range:
    """This process's contiguous slice of [0, n) for host-local data
    loading (replaces DistributedSampler)."""
    p, i = jax.process_count(), jax.process_index()
    per = (n + p - 1) // p
    return range(i * per, min((i + 1) * per, n))


# ---------------------------------------------------------------- global
# arrays: host trees -> jax.Arrays laid out over a multi-process mesh.
# (Single-process: plain device_put, so call sites are uniform.)

def replicate_global(tree: Any, mesh) -> Any:
    """Replicate a host tree (identical on every process) over the mesh."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    sharding = NamedSharding(mesh, P())
    if jax.process_count() == 1:
        return jax.device_put(tree, sharding)
    from jax.experimental import multihost_utils
    return multihost_utils.host_local_array_to_global_array(
        jax.tree.map(lambda a: jax.numpy.asarray(a), tree), mesh, P())


def shard_batch_global(tree: Any, mesh, axis: str = "data",
                       already_local: bool = False) -> Any:
    """Host batch tree -> batch-sharded global arrays.

    already_local=False: every process holds the FULL batch and
    contributes its contiguous row block (batch must divide
    process_count). already_local=True: each process holds only ITS row
    block (e.g. a sharded Prefetcher) and the blocks concatenate into
    the global batch in process order."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    sharding = NamedSharding(mesh, P(axis))
    if jax.process_count() == 1:
        return jax.device_put(tree, sharding)
    from jax.experimental import multihost_utils
    if not already_local:
        p, i = jax.process_count(), jax.process_index()

        def slice_local(a):
            n = a.shape[0]
            assert n % p == 0, f"batch {n} not divisible by {p} processes"
            per = n // p
            return a[i * per:(i + 1) * per]

        tree = jax.tree.map(slice_local, tree)
    return multihost_utils.host_local_array_to_global_array(
        tree, mesh, P(axis))


def to_host(tree: Any) -> Any:
    """Fully-replicated global arrays -> host numpy (addressable
    everywhere since every process holds a full replica)."""
    import numpy as np
    return jax.tree.map(np.asarray, tree)
