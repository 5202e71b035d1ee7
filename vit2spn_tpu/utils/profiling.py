"""Profiling utilities.

The reference's only introspection is fvcore FLOP counts and a never-called
GPU-memory logger (ssp_vit2spn_tiny.py:178-194). Here:

  * `trace(...)`: capture a JAX/XLA device trace (TensorBoard-compatible
    xplane + chrome trace) around any callable.
  * `op_breakdown(...)`: parse the chrome trace into a per-op / per-source
    time table — usable headless (no TensorBoard needed); this is how the
    augmentation gather bottleneck and per-fold recompilation were found.

Platform note: on tunneled runtimes `block_until_ready` can return before
execution finishes — always force a host fetch (float()/np.asarray) inside
the traced region to get true device spans.
"""

from __future__ import annotations

import collections
import contextlib
import glob
import gzip
import json
import os
from typing import Callable, Optional


def device_memory_report(timeout_s: Optional[float] = None) -> dict:
    """Per-device memory usage — the TPU-native equivalent of the
    reference's `log_gpu_memory` (ssp_vit2spn_tiny.py:178-181,
    torch.cuda.memory_allocated/reserved; defined there but never called —
    here it IS called at `run ssp` startup). Returns {} on backends that
    expose no stats (CPU; the axon TPU runtime also reports none).

    `timeout_s` makes the call best-effort: the stats RPCs run in a daemon
    watchdog thread and a hang returns {"error": ...} after the budget
    instead of blocking the flagship entry path (a tunnel outage has been
    observed to HANG device calls, not fail them)."""
    import jax

    def collect() -> dict:
        out = {}
        for dev in jax.local_devices():
            try:
                stats = dev.memory_stats()
            except Exception:  # noqa: BLE001 — backend without stats
                stats = None
            if not stats:
                continue
            out[str(dev.id)] = {
                "bytes_in_use_mb": round(
                    stats.get("bytes_in_use", 0) / 2**20, 1
                ),
                "peak_bytes_mb": round(
                    stats.get("peak_bytes_in_use", 0) / 2**20, 1
                ),
                "bytes_limit_mb": round(stats.get("bytes_limit", 0) / 2**20, 1),
            }
        return out

    if timeout_s is None:
        return collect()

    import threading

    result: dict = {}
    done = threading.Event()

    def run():
        try:
            result.update(collect())
        except Exception as e:  # noqa: BLE001 — best-effort under watchdog
            result["error"] = f"{type(e).__name__}: {e}"
        finally:
            done.set()

    t = threading.Thread(target=run, daemon=True)
    t.start()
    if not done.wait(timeout_s):
        # abandon the hung daemon thread; the process must not block
        return {"error": f"memory stats timed out after {timeout_s:g}s"}
    return result


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/vit2spn_trace"):
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def latest_trace_file(log_dir: str) -> Optional[str]:
    files = sorted(glob.glob(os.path.join(log_dir, "plugins/profile/*/*.trace.json.gz")))
    return files[-1] if files else None


def op_breakdown(log_dir: str, top: int = 20) -> list:
    """Aggregate device-op time by source line from the newest trace.

    Returns [(source_or_opname, total_us, count)] sorted descending.
    """
    path = latest_trace_file(log_dir)
    if path is None:
        return []
    with gzip.open(path) as f:
        events = json.load(f)["traceEvents"]

    def collect(device_only: bool):
        agg = collections.defaultdict(float)
        counts = collections.Counter()
        for e in events:
            if e.get("ph") != "X" or "dur" not in e:
                continue
            args = e.get("args", {})
            name = e.get("name", "")
            if device_only and (
                "device_duration_ps" not in args and "long_name" not in args
            ):
                continue  # host-side span
            if name in ("while",) or name.isdigit() or name.startswith("$"):
                continue  # parent spans / python host frames
            key = args.get("source") or name
            agg[key] += e["dur"]
            counts[key] += 1
        return agg, counts

    # TPU traces carry device annotations; CPU traces don't — fall back
    agg, counts = collect(device_only=True)
    if not agg:
        agg, counts = collect(device_only=False)
    rows = sorted(
        ((k, v, counts[k]) for k, v in agg.items()), key=lambda r: -r[1]
    )
    return rows[:top]


def profile_fn(fn: Callable, *args, log_dir: str = "/tmp/vit2spn_trace",
               warmup: bool = True, top: int = 20):
    """Trace one invocation of `fn(*args)` and return the op breakdown."""
    import jax
    import numpy as np

    def run():
        out = fn(*args)
        # force full execution before stop_trace
        jax.tree.map(lambda x: np.asarray(x) if hasattr(x, "dtype") else x, out)
        return out

    if warmup:
        run()
    with trace(log_dir):
        run()
    return op_breakdown(log_dir, top=top)
