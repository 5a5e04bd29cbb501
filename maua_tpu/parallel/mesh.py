"""Device mesh + sharding helpers.

TPU-native replacement for the reference's parallelism backends
(SURVEY.md section 2.14: gloo DDP in `maua/super/image/bulk.py:30-113`,
Lightning DDP, megatron-style TP in CogVideo): one
`jax.sharding.Mesh` with a `data` axis (frames/batch over ICI — this
is also the "sequence" axis of a video render) and a `tensor` axis for
parameter sharding. Collectives are inserted by XLA from NamedSharding
annotations; there is no NCCL/gloo analog in user code.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    axes: Tuple[str, ...] = ("data", "tensor"),
    shape: Optional[Tuple[int, ...]] = None,
) -> Mesh:
    """Build a Mesh over the first `n_devices` devices.

    Default layout puts all devices on `data` (pure DP over ICI) with a
    singleton `tensor` axis; pass `shape` for real TP, e.g.
    make_mesh(8, shape=(4, 2)).
    """
    devices = jax.devices()[: (n_devices or len(jax.devices()))]
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axes) - 1)
    arr = np.array(devices).reshape(shape)
    return Mesh(arr, axes)


def shard_batch(mesh: Mesh, tree, axis: str = "data"):
    """Place a pytree of batched arrays with the leading axis sharded
    over `axis` (replicated in all other dims)."""

    def place(x):
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(place, tree)


def _param_spec(path: str, x, axis: str, min_size: int) -> P:
    """Tensor-parallel spec: shard the output-channel (last) dim of
    large weights when divisible; replicate everything else."""
    tensor_size = 1
    if x.ndim >= 2 and x.shape[-1] % min_size == 0 and x.shape[-1] >= min_size:
        return P(*([None] * (x.ndim - 1)), axis)
    return P()


def shard_params(mesh: Mesh, params, axis: str = "tensor"):
    """Place a param pytree with TP sharding on the output-feature dim
    of matrices/convs (divisible by the mesh axis size), replicating
    small leaves. XLA then partitions the matmuls and inserts the
    all-gathers/reduce-scatters over ICI."""
    size = mesh.shape[axis]

    def place(x):
        if size > 1 and hasattr(x, "ndim") and x.ndim >= 2 and x.shape[-1] % size == 0:
            spec = P(*([None] * (x.ndim - 1)), axis)
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(place, params)


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> bool:
    """Multi-host bring-up (SURVEY.md section 2.14 comm backend:
    `jax.distributed.initialize` replaces torch.distributed env
    rendezvous). On TPU pods all arguments auto-detect from the
    metadata server; pass them explicitly elsewhere. MUST run before
    any jax call that initializes the XLA backend (so this function
    deliberately avoids jax.devices()/process_count()). Returns False
    (no-op) when already initialized or when there is no coordinator
    to rendezvous with."""
    if jax.distributed.is_initialized():
        return False
    # only attempt when there is something to rendezvous with: an
    # explicit coordinator, a cluster env (set by jax launchers), or a
    # cloud TPU pod environment whose metadata auto-detects — checked
    # WITHOUT touching the backend.
    import os

    cluster_env = any(
        os.environ.get(v)
        for v in (
            "JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
            "MEGASCALE_COORDINATOR_ADDRESS", "TPU_WORKER_HOSTNAMES",
            "CLOUD_TPU_TASK_ID", "SLURM_JOB_ID", "OMPI_COMM_WORLD_SIZE",
        )
    )
    if coordinator_address is None and not cluster_env:
        return False
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        return True
    except (RuntimeError, ValueError) as e:
        print(f"multi-host init skipped ({e})")
        return False


def make_multihost_mesh(
    axes: Tuple[str, ...] = ("data", "tensor"),
    ici_shape: Optional[Tuple[int, ...]] = None,
    dcn_shape: Optional[Tuple[int, ...]] = None,
) -> Mesh:
    """Mesh spanning ICI within a slice and DCN across slices/hosts
    (SURVEY.md section 5: "a single Mesh over ICI (devices) x DCN
    (hosts)"). The `data` axis crosses DCN (per-host frame/batch
    shards; gradient/EMA reductions are the only cross-host traffic)
    while `tensor` stays inside a slice so TP collectives ride ICI.
    Falls back to a flat mesh on a single host/slice."""
    devices = jax.devices()
    has_slices = hasattr(devices[0], "slice_index")
    n_slices = len({getattr(d, "slice_index", 0) for d in devices})
    # non-TPU backends have no slice topology: the granule is the host
    # process (create_hybrid_device_mesh(process_is_granule=True))
    n_granules = n_slices if has_slices else jax.process_count()
    if n_granules <= 1:
        return make_mesh(axes=axes)
    from jax.experimental import mesh_utils

    per_granule = len(devices) // n_granules
    ici = ici_shape or (per_granule,) + (1,) * (len(axes) - 1)
    dcn = dcn_shape or (n_granules,) + (1,) * (len(axes) - 1)
    arr = mesh_utils.create_hybrid_device_mesh(
        ici, dcn, devices=devices, process_is_granule=not has_slices
    )
    return Mesh(arr, axes)
