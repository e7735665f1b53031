"""Device mesh, shardings, and the few explicit collectives.

The reference's entire distributed layer — NCCL process groups
(``main_byol.py:171-174``), DDP gradient hooks (``models/model.py:90-103``),
DistributedSampler with global-batch division (``utils.py:94-132``), and the
explicit ``all_reduce`` metric mean (``main_byol.py:22-26``) — collapses on
TPU into: build a ``jax.sharding.Mesh``, shard the batch over the 'data'
axis, keep params replicated, and jit. XLA's SPMD partitioner inserts the
gradient all-reduce over ICI; metric means over the sharded batch axis are
global automatically.

Mesh axes: ('data', 'model'). 'model' defaults to 1; when >1 the 4096-wide
BYOL projector/predictor MLPs may be tensor-sharded over it (the only
weight-sharding-worthy matmuls in this model family; everything else is
small convs best replicated).

Multi-host note: on a multi-host TPU slice, call ``jax.distributed
.initialize()`` before ``create_mesh`` and feed per-host batch shards; the
mesh spans all hosts' devices and collectives ride ICI/DCN — no code change.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    shape: Tuple[int, ...] = (-1, 1),
    axes: Tuple[str, ...] = ("data", "model"),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a mesh; one ``-1`` dim absorbs all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    shape = list(shape)
    if -1 in shape:
        known = int(np.prod([s for s in shape if s != -1]))
        assert n % known == 0, f"{n} devices not divisible by mesh {shape}"
        shape[shape.index(-1)] = n // known
    assert int(np.prod(shape)) == n, f"mesh {shape} != {n} devices"
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axes)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim split over 'data'; everything else replicated."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """device_put every array in a pytree with its batch dim over 'data'."""
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params/opt state) across the mesh."""
    s = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)
