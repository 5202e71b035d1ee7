"""RNG-key discipline.

The reference seeds Python/torch RNGs once per script (ssp_vit2spn_tiny.py:46-50,
seed=42) and relies on global stateful RNG. Here every source of randomness is an
explicit `jax.random` key, folded from a single root seed, so runs are
deterministic per (seed, epoch, step) even under data parallelism — and the
augmentation pipeline can draw per-example keys on device.
"""

from __future__ import annotations

import jax


def root_key(seed: int) -> jax.Array:
    return jax.random.key(seed)


def fold(key: jax.Array, *data: int) -> jax.Array:
    for d in data:
        key = jax.random.fold_in(key, d)
    return key


def split_tree(key: jax.Array, names):
    """Named key split: returns {name: key}."""
    keys = jax.random.split(key, len(names))
    return dict(zip(names, keys))
