"""Tensor parallelism: Megatron-style param shardings over the `model` axis.

The reference has no tensor parallelism (SURVEY.md §2.2 — ViT-Tiny at 5.7M
params/backbone doesn't need it); this module is the optional 2-D mesh
demonstration the survey calls for, done for real: parameters are genuinely
partitioned over the mesh's `model` axis and GSPMD inserts the collectives.

Sharding scheme (classic column/row-parallel pairing, so each block needs
exactly one all-reduce after attention and one after the MLP):

  wqkv (L, d, 3d)  column-parallel  P(None, None, model)
  bqkv (L, 3d)                      P(None, model)
  wo   (L, d, d)   row-parallel     P(None, model, None)
  w1   (L, d, m)   column-parallel  P(None, None, model)
  b1   (L, m)                       P(None, model)
  w2   (L, m, d)   row-parallel     P(None, model, None)
  SSP heads: first linear column-parallel, second row-parallel.
  Everything else (LN, embeddings, biases of row-parallel layers) replicated.

The specs are derived from leaf NAMES via tree_map_with_path, so they apply
uniformly to the param tree, the stacked dual-stream trees (extra leading net
axis), and the optimizer state (adam mu/nu mirror the param tree). Notes:

  * The stored qkv layout is (d, 3d) with q|k|v concatenated, so the 3-way
    split inside the block crosses shard boundaries; GSPMD inserts a reshard
    there. Exactness is unaffected; a head-aligned (d, 3, h, dh) layout would
    remove the reshard if TP ever matters at scale for this model family.
  * The whole-block fused Pallas kernel is DP-only; trainers fall back to the
    XLA attention path when model_parallel > 1 (documented dispatch).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.tree_util import DictKey, GetAttrKey

# leaf name -> (spec builder given model-axis name). `extra` leading dims
# (stacked nets, scan/layer axes) are padded with None by _pad.
_COL_PARALLEL = {"wqkv", "w1"}          # shard last (output) dim
_ROW_PARALLEL = {"wo", "w2"}            # shard second-to-last (input) dim
_COL_BIAS = {"bqkv", "b1"}              # shard last dim


def _leaf_names(path) -> list:
    names = []
    for k in path:
        if isinstance(k, DictKey):
            names.append(str(k.key))
        elif isinstance(k, GetAttrKey):
            names.append(str(k.name))
    return names


def _spec_for(path, leaf, model_axis: str) -> P:
    names = _leaf_names(path)
    name = names[-1] if names else ""
    nd = leaf.ndim

    if name in _COL_PARALLEL and nd >= 2:
        return P(*([None] * (nd - 1)), model_axis)
    if name in _ROW_PARALLEL and nd >= 2:
        return P(*([None] * (nd - 2)), model_axis, None)
    if name in _COL_BIAS and nd >= 1:
        return P(*([None] * (nd - 1)), model_axis)

    # SSP projection/prediction heads: {"linear_0": {"w","b"}, "linear_1": ...}
    # first layer column-parallel, second row-parallel (output replicated via
    # GSPMD all-reduce).
    if len(names) >= 2 and names[-2].startswith("linear_"):
        layer = int(names[-2].split("_")[1])
        if layer == 0 and name == "w" and nd >= 2:
            return P(*([None] * (nd - 1)), model_axis)
        if layer == 0 and name == "b" and nd >= 1:
            return P(*([None] * (nd - 1)), model_axis)
        if layer >= 1 and name == "w" and nd >= 2:
            return P(*([None] * (nd - 2)), model_axis, None)
    return P()


def tp_state_shardings(mesh: Mesh, state, model_axis: str = "model"):
    """NamedSharding pytree for a train state (params + optimizer state):
    TP specs for the matmul weights, replicated for everything else.

    Leaves whose sharded dimension doesn't divide by the axis size fall back
    to replicated (keeps tiny test configs and odd head counts valid)."""
    axis_size = mesh.shape[model_axis]

    def one(path, leaf):
        spec = _spec_for(path, leaf, model_axis)
        for dim, ax in enumerate(spec):
            if ax == model_axis and leaf.shape[dim] % axis_size != 0:
                spec = P()
                break
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(one, state)


def assert_tensor_parallel(state, model_axis: str = "model") -> int:
    """Return the number of leaves actually partitioned over `model_axis`
    (inspecting .sharding.spec); raises if none are — the test hook that
    keeps the TP claim honest."""
    count = 0
    for leaf in jax.tree.leaves(state):
        spec = getattr(getattr(leaf, "sharding", None), "spec", None)
        if spec and model_axis in spec:
            count += 1
    if count == 0:
        raise AssertionError(f"no leaf is partitioned over {model_axis!r}")
    return count
