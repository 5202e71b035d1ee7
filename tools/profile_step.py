"""Per-op device-time breakdown of ONE production SSP train step.

Usage: python tools/profile_step.py [--vit tiny|small|base]

NOTE: single-step dispatch adds ~85 ms host overhead vs bench.py's epoch
scan — use this for per-op attribution, bench.py for canonical throughput.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax  # noqa: E402
import numpy as np  # noqa: E402,F401

from vit2spn_tpu.core.config import SSPConfig, ViTConfig, replace  # noqa: E402
from vit2spn_tpu.core.runtime import enable_compilation_cache  # noqa: E402
from vit2spn_tpu.data.datasets import synthetic_dataset  # noqa: E402
from vit2spn_tpu.train.ssp import SSPTrainer  # noqa: E402
from vit2spn_tpu.utils.logging import MetricLogger  # noqa: E402
from vit2spn_tpu.utils.profiling import profile_fn  # noqa: E402

enable_compilation_cache()

ap = argparse.ArgumentParser()
ap.add_argument("--vit", choices=["tiny", "small", "base"], default="tiny")
args = ap.parse_args()

cfg = SSPConfig(pretrained_init=False)
if args.vit != "tiny":
    cfg = replace(cfg, vit=getattr(ViTConfig, args.vit)())
tr = SSPTrainer(cfg, logger=MetricLogger(echo=False))
ds = synthetic_dataset(image_size=28, split_sizes={"train": cfg.effective_batch})
batch = ds.images[: cfg.effective_batch]


def step():
    m = tr.train_step(batch, jax.random.key(0))
    return float(m["loss"])


rows = profile_fn(step, top=30)
total = sum(r[1] for r in rows)
for src, us, n in rows:
    print(f"{us/1e3:9.2f} ms  x{n:5d}  {src[-100:]}")
print(f"total listed: {total/1e3:.1f} ms")
