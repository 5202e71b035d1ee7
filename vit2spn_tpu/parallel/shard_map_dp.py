"""Explicit-collective data parallelism via shard_map + psum.

The default training path uses jit-with-shardings (GSPMD): XLA infers the
gradient all-reduce. This module provides the explicit formulation — per-shard
gradients reduced with collectives over the mesh's data axis inside
`jax.shard_map` — as (a) the direct TPU-native replacement for the
reference's DDP scaffold (ssp_vit2spn_tiny.py:170-172, where DDP's bucketed
NCCL all-reduce is the gradient reduction), and (b) a template for manual
collective placement when scaling beyond what GSPMD schedules well
(multi-slice DCN boundaries).

Two gradient-reduction contracts are supported (`grad_reduce`):

  * "pmean" — `local_step` returns LOCAL-batch-MEAN gradients; the wrapper
    averages them across shards. Correct only for uniform per-sample weights
    (every shard's mean carries equal weight).
  * "psum" — `local_step` returns gradient PARTIAL SUMS already normalized
    by the GLOBAL weight sum (which the local step obtains itself via
    `lax.psum` over the data axis); the wrapper adds them. This is how the
    SSP trainer supports the reference's weight-masked partial final
    accumulation group (ssp_vit2spn_tiny.py:215) in shard_map mode: a tail
    whose real-sample count differs across shards still normalizes by the
    one global denominator, matching the GSPMD path exactly.

Equivalence with the GSPMD path (both contracts, incl. the masked tail) is
asserted in tests/test_shard_map.py.
"""

from __future__ import annotations

from typing import Callable

import jax
from jax.sharding import Mesh, PartitionSpec as P


def shard_map_dp_step(
    local_step: Callable,
    mesh: Mesh,
    data_axis: str = "data",
    grad_reduce: str = "pmean",
    batch_dim: int = 0,
):
    """Wrap a per-shard SSP step into an SPMD program with explicit collectives.

    `local_step(state, local_batch, key, local_w) -> (grads, metrics)`
    computes gradients of the trainable params from this shard's batch slice
    (normalization contract per `grad_reduce`, see module docstring). The
    wrapper reduces gradients with pmean/psum over `data_axis`, pmeans the
    metrics (a metric the local step already made globally identical passes
    through unchanged), and returns them; the optimizer/EMA update then runs
    replicated in the caller.

    `batch_dim` picks which axis of batch/w is sharded. The SSP trainer
    pre-splits the flat batch into (accum, B, ...) microbatches and shards
    axis 1, so every shard sees a slice of EVERY microbatch — the microbatch
    composition (and hence the per-microbatch weighted normalization of the
    masked tail) is identical to the GSPMD path's global reshape.
    """
    if grad_reduce not in ("pmean", "psum"):
        raise ValueError(f"grad_reduce must be 'pmean' or 'psum', got {grad_reduce!r}")
    reduce = jax.lax.psum if grad_reduce == "psum" else jax.lax.pmean
    spec = P(*([None] * batch_dim), data_axis)

    def spmd(state, batch, key, w):
        # decorrelate augmentation/dropout draws across shards (the GSPMD
        # path gets this per-example; here the key is per-shard)
        key = jax.random.fold_in(key, jax.lax.axis_index(data_axis))
        grads, metrics = local_step(state, batch, key, w)
        grads = reduce(grads, axis_name=data_axis)
        metrics = jax.lax.pmean(metrics, axis_name=data_axis)
        return grads, metrics

    return jax.shard_map(
        spmd,
        mesh=mesh,
        in_specs=(P(), spec, P(), spec),
        out_specs=(P(), P()),
        check_vma=False,
    )
