"""ctypes binding for the native host data-plane (native/dataplane.cpp).

Auto-builds the shared library on first use (g++, ~1 s) and falls back to
numpy transparently if no compiler is available or VIT2SPN_NO_NATIVE is set.
All entry points are drop-in numpy-equivalent (tests assert equality).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LIB = None
_LOCK = threading.Lock()
_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")


def _load_library():
    """Returns the loaded library, or None for the numpy fallback. A failed
    build/load is memoized (_LIB = False) so a broken toolchain costs ONE
    g++ attempt, not a 120 s-timeout subprocess per epoch/step call."""
    global _LIB
    if _LIB is not None or os.environ.get("VIT2SPN_NO_NATIVE"):
        return _LIB or None
    with _LOCK:
        if _LIB is not None:
            return _LIB or None
        so_path = os.path.abspath(
            os.path.join(_NATIVE_DIR, "libvit2spn_dataplane.so")
        )
        src_path = os.path.abspath(os.path.join(_NATIVE_DIR, "dataplane.cpp"))
        if not os.path.exists(so_path) and os.path.exists(src_path):
            try:
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                     "-pthread", "-o", so_path, src_path],
                    check=True, capture_output=True, timeout=120,
                )
            except Exception:  # noqa: BLE001 — no compiler: numpy fallback
                _LIB = False
                return None
        if not os.path.exists(so_path):
            _LIB = False
            return None
        try:
            lib = ctypes.CDLL(so_path)
        except OSError:
            _LIB = False
            return None
        lib.vit2spn_gather_u8.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
        ]
        lib.vit2spn_shuffled_indices.argtypes = [
            ctypes.c_int64, ctypes.c_uint64, ctypes.c_void_p,
        ]
        lib.vit2spn_bincount.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p,
        ]
        _LIB = lib
    return _LIB


def available() -> bool:
    return _load_library() is not None


def gather_batch(images: np.ndarray, idx: np.ndarray,
                 out: np.ndarray | None = None,
                 n_threads: int | None = None) -> np.ndarray:
    """out[i] = images[idx[i]] — threaded memcpy gather. Bit-identical to
    numpy fancy indexing (tests/test_native.py); falls back to it when the
    library is unavailable or the array isn't a contiguous uint8 block."""
    lib = _load_library()
    idx = np.ascontiguousarray(np.asarray(idx).reshape(-1), dtype=np.int64)
    if (
        lib is None
        or images.dtype != np.uint8
        or not images.flags.c_contiguous
        # the C gather does raw memcpy arithmetic with no bounds checks;
        # route negative (numpy wraparound semantics) or out-of-range
        # indices through numpy, which handles/raises correctly
        or (len(idx) and (idx.min() < 0 or idx.max() >= len(images)))
    ):
        return images[idx]
    row_bytes = int(np.prod(images.shape[1:]))
    if out is None:
        out = np.empty((len(idx),) + images.shape[1:], dtype=np.uint8)
    lib.vit2spn_gather_u8(
        images.ctypes.data, idx.ctypes.data, out.ctypes.data,
        len(idx), row_bytes, n_threads or (os.cpu_count() or 1),
    )
    return out


def shuffled_indices(n: int, seed: int) -> np.ndarray:
    """Deterministic Fisher-Yates permutation (splitmix64)."""
    lib = _load_library()
    if lib is None:
        return np.random.default_rng(seed).permutation(n)
    out = np.empty(n, dtype=np.int64)
    lib.vit2spn_shuffled_indices(n, np.uint64(seed), out.ctypes.data)
    return out


def bincount(labels: np.ndarray, num_classes: int) -> np.ndarray:
    lib = _load_library()
    labels = np.ascontiguousarray(labels, dtype=np.int64)
    if lib is None:
        return np.bincount(labels, minlength=num_classes).astype(np.int64)
    out = np.empty(num_classes, dtype=np.int64)
    lib.vit2spn_bincount(labels.ctypes.data, len(labels), num_classes,
                         out.ctypes.data)
    return out
