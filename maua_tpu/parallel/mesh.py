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
