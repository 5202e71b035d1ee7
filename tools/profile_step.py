import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import numpy as np

from vit2spn_tpu.core.config import SSPConfig
from vit2spn_tpu.core.runtime import enable_compilation_cache
from vit2spn_tpu.data.datasets import synthetic_dataset
from vit2spn_tpu.train.ssp import SSPTrainer
from vit2spn_tpu.utils.logging import MetricLogger
from vit2spn_tpu.utils.profiling import profile_fn

enable_compilation_cache()

cfg = SSPConfig(pretrained_init=False)
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
