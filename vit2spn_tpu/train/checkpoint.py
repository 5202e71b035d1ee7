"""Checkpoint save/resume.

Reproduces the reference's checkpoint contract (SURVEY.md section 1):
  * periodic training checkpoints {epoch, model, optimizer, loss} every 10
    epochs with resume-on-startup (ssp_vit2spn_tiny.py:53-72,198,231-232);
  * a final backbone-only export (stream-1 online network,
    ssp_vit2spn_tiny.py:246) that every fine-tune script consumes
    (octmnist_ft_vit2spn.py:190).

Format: single .npz with path-flattened pytree leaves + a JSON metadata blob
— self-describing, dependency-free, loadable with plain numpy. `restore`
takes a template pytree (`like=`) and returns the same structure, which also
gives the reference's `strict=False` semantics (ssp_vit2spn_tiny.py:66) via
`strict=False`: missing leaves keep the template's value.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Optional

import jax
import numpy as np


def _path_key(path_elems) -> str:
    return "/".join(
        str(getattr(p, "key", getattr(p, "idx", getattr(p, "name", p))))
        for p in path_elems
    )


def _flatten(tree) -> dict:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        flat[_path_key(path)] = np.asarray(leaf)
    return flat


def save(path: str, tree, metadata: Optional[dict] = None) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    payload = _flatten(tree)
    payload["__metadata__"] = np.frombuffer(
        json.dumps(metadata or {}).encode(), dtype=np.uint8
    )
    # atomic write: tmp file + rename, so a preempted save never corrupts the
    # resume path
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(os.path.abspath(path)))
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **payload)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def metadata(path: str) -> dict:
    with np.load(path) as raw:
        if "__metadata__" in raw:
            return json.loads(raw["__metadata__"].tobytes().decode())
    return {}


def compatible(path: str, like) -> Optional[str]:
    """None when `restore(path, like, strict=True)` would succeed (same leaf
    keys, same element counts — restore reshapes, so shape is checked by
    SIZE exactly like restore does); else a human-readable reason. Never
    raises for a well-formed npz; reads leaf metadata from the host copy
    without touching `like`'s (possibly device-resident) values."""
    with np.load(path) as raw:
        stored = {
            k: raw[k].shape for k in raw.files if k != "__metadata__"
        }
    used = set()
    for path_elems, leaf in jax.tree_util.tree_flatten_with_path(like)[0]:
        key = _path_key(path_elems)
        if key not in stored:
            return f"checkpoint lacks leaf {key!r}"
        want = np.shape(leaf)
        if int(np.prod(stored[key])) != int(np.prod(want)):
            return (
                f"leaf {key!r}: stored shape {stored[key]} is incompatible "
                f"with expected {tuple(want)}"
            )
        used.add(key)
    extra = sorted(set(stored) - used)
    if extra:
        return f"checkpoint has extra leaves {extra[:5]}"
    return None


def restore(path: str, like, strict: bool = True):
    """Load leaves into the structure of `like`. strict=False tolerates
    missing/extra keys (torch load_state_dict(strict=False) analogue)."""
    with np.load(path) as raw:
        stored = {k: raw[k] for k in raw.files if k != "__metadata__"}

    paths_leaves, treedef = jax.tree_util.tree_flatten_with_path(like)
    leaves = []
    missing = []
    used = set()
    for path_elems, leaf in paths_leaves:
        key = _path_key(path_elems)
        if key in stored:
            arr = stored[key]
            leaves.append(np.asarray(arr).astype(np.asarray(leaf).dtype).reshape(np.shape(leaf)))
            used.add(key)
        else:
            missing.append(key)
            leaves.append(leaf)
    extra = set(stored) - used
    if strict and (missing or extra):
        raise KeyError(f"checkpoint mismatch: missing={missing[:5]} extra={sorted(extra)[:5]}")
    return jax.tree_util.tree_unflatten(treedef, leaves)


def exists(path: str) -> bool:
    return os.path.exists(path)
