"""Device mesh + sharding helpers.

Replaces the reference's dead DDP/NCCL scaffold (ssp_vit2spn_tiny.py:20-25,
`use_distributed = False`; device_ids=[0..5] at :172) with first-class SPMD:
a `jax.sharding.Mesh` whose `data` axis shards the global batch over ICI and
whose optional `model` axis tensor-parallelizes the MLP/attention projections.
Gradients are reduced with XLA collectives (psum under shard_map, or implicit
all-reduce under jit-with-shardings) riding ICI — no process groups, no NCCL.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    model_parallel: int = 1,
    data_axis: str = "data",
    model_axis: str = "model",
) -> Mesh:
    """Build a (data, model) mesh over the given devices.

    With `model_parallel == 1` this is a pure data-parallel mesh — the honest
    strategy for a 5.5M-param ViT-Tiny — but the second axis is always present
    so train steps are written once against 2-D shardings.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, (data_axis, model_axis))


def batch_sharding(mesh: Mesh, ndim: int, data_axis: str = "data") -> NamedSharding:
    """Shard dim 0 (batch) over the data axis, replicate the rest."""
    return NamedSharding(mesh, P(data_axis, *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, data_axis: str = "data"):
    """Place a host batch (pytree of arrays) sharded over the data axis."""
    def put(x):
        return jax.device_put(x, batch_sharding(mesh, x.ndim, data_axis))
    return jax.tree.map(put, batch)
