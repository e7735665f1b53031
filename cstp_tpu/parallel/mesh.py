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

import os
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_DIST_INITIALIZED = False


def honor_platform_env() -> None:
    """Make ``JAX_PLATFORMS`` from the environment actually win.

    Some hosted environments register an out-of-tree PJRT backend from
    ``sitecustomize`` and override the platform list via
    ``jax.config.update('jax_platforms', ...)`` — which silently takes
    precedence over the ``JAX_PLATFORMS`` env var a user sets to force a
    local run (observed: ``JAX_PLATFORMS=cpu`` CLI runs hanging forever on
    a dead tunneled-TPU claim). Every CLI calls this before any backend
    initialization: if the env var is set and no backend is live yet, push
    its value back into jax.config so the env var means what it says.
    """
    want = os.environ.get("JAX_PLATFORMS")
    if not want:
        return
    try:
        if jax.config.jax_platforms != want:
            jax.config.update("jax_platforms", want)
    except Exception:
        pass  # too late (backend already initialized) or unknown config


def maybe_initialize_distributed() -> bool:
    """Multi-host rendezvous — the ``dist.init_process_group(init_method=
    'env://')`` equivalent (reference main_byol.py:171-174).

    Called by every CLI before building the mesh. Initializes
    ``jax.distributed`` when either

    * explicit env rendezvous is configured — ``CSTP_COORDINATOR`` (or
      ``JAX_COORDINATOR_ADDRESS``) plus ``CSTP_NUM_PROCESSES``/
      ``CSTP_PROCESS_ID`` (or jax's ``JAX_NUM_PROCESSES``/
      ``JAX_PROCESS_ID``), mirroring torch's MASTER_ADDR/WORLD_SIZE/RANK; or
    * ``CSTP_AUTO_DISTRIBUTED=1`` — TPU-pod auto-detection, where
      ``jax.distributed.initialize()`` reads the cluster environment.

    Returns True if initialization ran. Safe to call twice; no-op on
    single-host runs (the mesh then spans local devices only).

    Launch recipe (one process per host, all hosts):
      CSTP_COORDINATOR=host0:1234 CSTP_NUM_PROCESSES=4 CSTP_PROCESS_ID=$i \\
          python -m cstp_tpu.cli.main_byol ...
    After initialize(), ``jax.devices()`` spans the slice; batches are fed
    per-host (loader shards by process_index) and collectives ride ICI/DCN.
    """
    global _DIST_INITIALIZED
    honor_platform_env()
    if _DIST_INITIALIZED:
        return False
    coord = os.environ.get("CSTP_COORDINATOR") or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    nproc = os.environ.get("CSTP_NUM_PROCESSES") or os.environ.get(
        "JAX_NUM_PROCESSES")
    pid = os.environ.get("CSTP_PROCESS_ID") or os.environ.get(
        "JAX_PROCESS_ID")
    auto = os.environ.get("CSTP_AUTO_DISTRIBUTED") == "1"
    if coord and nproc is not None and pid is not None:
        jax.distributed.initialize(coordinator_address=coord,
                                   num_processes=int(nproc),
                                   process_id=int(pid))
        _DIST_INITIALIZED = True
        return True
    if auto:
        jax.distributed.initialize()
        _DIST_INITIALIZED = True
        return True
    return False


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


def spatial_constraint_fn(config):
    """``--shard_spatial``: spatial partitioning of the conv stack (the
    'sequence/context parallelism' analog for video CNNs — SURVEY §2.4
    "long-clip scaling ... spatial sharding via pjit if ever needed").

    Returns a callable applied to NDHWC ``(B, T, H, W, C)`` activations
    inside the jitted steps: it constrains H over the 'model' axis, and
    XLA's SPMD partitioner propagates the split through every conv
    (inserting halo exchanges over ICI for the kernel overlap) and
    re-reduces at the global pools/BN stats. Use it when one sample's
    activations don't fit a chip — long clips (``--sample_duration`` 64+)
    or 224² inputs — the regimes DP alone can't reach. Numerics: the conv
    halo machinery is exact (tests/test_cross_topology.py::
    test_spatial_halo_conv_is_exact); full training trajectories agree up
    to f32 BatchNorm-statistic summation-order noise, because H-sharding
    splits each sample's within-sample stat sums — a reassociation batch
    sharding never performs (measured analysis in
    test_spatial_partitioning_forward_exact_trajectory_consistent).

    Identity when the flag is off or the mesh has no 'model' dimension.
    """
    if not getattr(config, "shard_spatial", 0):
        return lambda x: x
    mesh = create_mesh(tuple(config.mesh_shape), tuple(config.mesh_axes))
    if mesh.shape.get("model", 1) <= 1:
        return lambda x: x
    s = NamedSharding(mesh, P("data", None, "model", None, None))

    def constrain(x):
        if x.ndim != 5:
            return x
        return jax.lax.with_sharding_constraint(x, s)

    return constrain


# width of the BYOL projector/predictor hidden layers — the only matmuls in
# this model family wide enough to be worth weight-sharding (r21d_byol.py:
# 232-257: Linear(512,4096)/Linear(4096,512))
MLP_WIDE_DIM = 4096


def _model_spec(shape) -> P:
    """Shape-based sharding rule for the 'model' axis: any tensor carrying
    the 4096-wide MLP dimension is split over 'model'; everything else
    (convs, BN, heads) is replicated. Applies uniformly to params, momentum
    buffers, and batch_stats because they share shapes."""
    if len(shape) == 2 and shape[1] == MLP_WIDE_DIM:
        return P(None, "model")   # fc1 kernel: column-parallel
    if len(shape) == 2 and shape[0] == MLP_WIDE_DIM:
        return P("model", None)   # fc2 kernel: row-parallel
    if len(shape) == 1 and shape[0] == MLP_WIDE_DIM:
        return P("model")         # fc1 bias / hidden-BN scale/bias/stats
    return P()


def _zero_spec(shape, data_size: int) -> P:
    """ZeRO-1 rule (arXiv:2004.13336 — cross-replica sharding of the weight
    update): split an optimizer-state tensor over 'data' along its largest
    evenly-divisible dim. XLA then keeps each replica's momentum shard local
    and inserts the reduce-scatter/all-gather pair around the update —
    optimizer memory drops ~data_size x at the cost of one gather."""
    if data_size > 1 and shape:
        dims = sorted(range(len(shape)), key=lambda i: -shape[i])
        for i in dims:
            if shape[i] % data_size == 0 and shape[i] >= data_size:
                spec = [None] * len(shape)
                spec[i] = "data"
                return P(*spec)
    return P()


def shard_state(mesh: Mesh, tree, zero_opt: bool = False):
    """device_put a train-state pytree with the 'model'-axis rules above.

    With mesh model=1 this is exactly :func:`replicate`. With model>1 the
    4096-wide tensors are tensor-parallel over 'model' and XLA inserts the
    matching all-gather/reduce-scatter around the MLP matmuls (Megatron-style
    column->row pairing falls out of the specs).

    ``zero_opt`` (``--shard_opt_state``): additionally shard the optimizer
    state (momentum buffers) over 'data' per :func:`_zero_spec` when ``tree``
    is a train state carrying ``opt_state``."""
    model_par = mesh.shape.get("model", 1) > 1
    data_size = mesh.shape.get("data", 1)

    def put(x, extra_rule=None):
        x = np.asarray(x) if not hasattr(x, "shape") else x
        spec = _model_spec(x.shape) if model_par else P()
        if extra_rule is not None and spec == P():
            spec = extra_rule(x.shape)
        return jax.device_put(x, NamedSharding(mesh, spec))

    if zero_opt and hasattr(tree, "opt_state"):
        rest = jax.tree_util.tree_map(put, tree.replace(opt_state=None))
        opt = jax.tree_util.tree_map(
            lambda x: put(x, lambda s: _zero_spec(s, data_size)),
            tree.opt_state)
        return rest.replace(opt_state=opt)
    if not model_par and not zero_opt:
        return replicate(mesh, tree)
    return jax.tree_util.tree_map(put, tree)
