"""Mesh construction and sharding helpers.

Design (SURVEY.md §5.8 rebuild plan): a 1-D mesh over all addressable
devices with axis 'data'. Parameters/optimizer/EMA are replicated;
batches are sharded on axis 0. The jitted train step is annotated with
these shardings, so XLA emits one fused `psum` for the gradients over ICI
(the DDP bucket-allreduce equivalent) and none of the host-side process
group management the reference needs (train.py:236-237, trainer.py:418-421).

Multi-host: `jax.distributed.initialize()` is the torchrun analog; each
process feeds its local slice of the global batch via
`local_batch_to_global` (the DistributedSampler replacement).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def data_parallel_mesh(num_devices: Optional[int] = None,
                       devices: Optional[Sequence] = None) -> Mesh:
    """Build a 1-D data-parallel mesh over (a prefix of) all devices."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 across the data axis; everything else replicated.

    On an expert-parallel mesh the batch axis spans BOTH ('data',
    'expert'): the dense majority of the network stays fully
    data-parallel across all devices, and XLA inserts the token
    all-to-alls where activations meet the 'expert'-sharded expert
    weights (parallel/expert_parallel.py)."""
    if "expert" in mesh.axis_names:
        return NamedSharding(mesh, P((DATA_AXIS, "expert")))
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a (global) host batch onto the mesh, sharded on axis 0."""
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params/opt/ema state) across the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree
    )


_DP_SHARDING_CACHE: dict = {}


def dp_batch_sharding(batch_size: int) -> Optional[NamedSharding]:
    """Batch sharding over all visible devices for single-process tools
    (CLI sampling, metric feature extraction), or None when it doesn't
    apply (one device, multi-process, or indivisible batch). Placing a
    batch with this sharding turns any jitted per-batch computation into
    an SPMD program via input shardings alone. Cached — callers sit in
    per-batch loops (metrics run this thousands of times per eval)."""
    ndev = jax.device_count()
    if jax.process_count() != 1 or ndev <= 1 or batch_size % ndev:
        return None
    key = ndev  # the device set is fixed within a process
    if key not in _DP_SHARDING_CACHE:
        _DP_SHARDING_CACHE[key] = batch_sharding(data_parallel_mesh())
    return _DP_SHARDING_CACHE[key]


def process_index() -> int:
    """This host's rank (replaces rank==0 gating, trainer.py:54)."""
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def local_batch_to_global(mesh: Mesh, local_batch):
    """Assemble a logically-global array from per-process local shards.

    Single-process: equivalent to `shard_batch`. Multi-host: each process
    contributes its local slice (the DistributedSampler-style sharded
    loader provides disjoint slices) and the result is a global jax.Array.
    """
    if jax.process_count() == 1:
        return shard_batch(mesh, local_batch)
    sharding = batch_sharding(mesh)

    def put(x):
        x = np.asarray(x)
        global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
        return jax.make_array_from_process_local_data(sharding, x, global_shape)

    return jax.tree_util.tree_map(put, local_batch)
