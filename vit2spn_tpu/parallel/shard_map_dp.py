"""Explicit-collective data parallelism via shard_map + psum.

The default training path uses jit-with-shardings (GSPMD): XLA infers the
gradient all-reduce. This module provides the explicit formulation — per-shard
gradients reduced with `jax.lax.pmean` over the mesh's data axis inside
`jax.shard_map` — as (a) the direct TPU-native replacement for the
reference's DDP scaffold (ssp_vit2spn_tiny.py:170-172, where DDP's bucketed
NCCL all-reduce is the gradient reduction), and (b) a template for manual
collective placement when scaling beyond what GSPMD schedules well
(multi-slice DCN boundaries).

Equivalence with the GSPMD path is asserted in tests/test_parallel.py.
"""

from __future__ import annotations

from typing import Callable

import jax
from jax.sharding import Mesh, PartitionSpec as P


def shard_map_dp_step(
    local_step: Callable,
    mesh: Mesh,
    data_axis: str = "data",
):
    """Wrap a per-shard SSP step into an SPMD program with explicit psum.

    `local_step(state, local_batch, key) -> (grads, loss)` computes
    LOCAL-batch-mean gradients of the trainable params. The wrapper reduces
    gradients and loss with pmean over `data_axis` and returns them; the
    optimizer/EMA update then runs replicated in the caller.
    """

    def spmd(state, batch, key):
        # decorrelate augmentation/dropout draws across shards (the GSPMD
        # path gets this per-example; here the key is per-shard)
        key = jax.random.fold_in(key, jax.lax.axis_index(data_axis))
        grads, loss = local_step(state, batch, key)
        grads = jax.lax.pmean(grads, axis_name=data_axis)
        loss = jax.lax.pmean(loss, axis_name=data_axis)
        return grads, loss

    return jax.shard_map(
        spmd,
        mesh=mesh,
        in_specs=(P(), P(data_axis), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
