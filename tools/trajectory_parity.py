"""On-chip trajectory parity: fused Pallas kernels vs the XLA path.

Runs N production-config SSP optimizer steps twice — attn_impl="fused" and
attn_impl="xla" — from the SAME init/data/RNG and reports the per-step loss
trajectories and their max absolute difference. This is the honest
end-to-end numerics gate for kernel changes (round-1 record: 1.2e-4; after
the whole-backbone kernel: 1.42e-4; re-run after any in-kernel numerics
change, e.g. VIT2SPN_FAST_GELU).

Usage: python tools/trajectory_parity.py [n_steps]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    from vit2spn_tpu.core.runtime import enable_compilation_cache

    enable_compilation_cache()
    import jax

    from vit2spn_tpu.core.config import SSPConfig
    from vit2spn_tpu.data.datasets import synthetic_dataset
    from vit2spn_tpu.train.ssp import SSPTrainer
    from vit2spn_tpu.utils.logging import MetricLogger

    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    cfg = SSPConfig(pretrained_init=False)
    ds = synthetic_dataset(
        image_size=28, split_sizes={"train": 2 * cfg.effective_batch}, seed=0
    )
    rng = np.random.default_rng(0)
    idx_mat = rng.integers(0, len(ds), (n_steps, cfg.effective_batch))
    keys = jax.random.split(jax.random.key(7), n_steps)

    losses = {}
    for impl in ("fused", "xla"):
        trainer = SSPTrainer(
            cfg, logger=MetricLogger(echo=False), attn_impl=impl
        )
        trainer.attach_dataset(ds.images)
        metrics = trainer.train_epoch(idx_mat, keys)
        losses[impl] = np.asarray(metrics["loss"]).reshape(-1)[:n_steps]
        print(f"{impl:5s}: " + " ".join(f"{v:+.6f}" for v in losses[impl]))

    dmax = float(np.abs(losses["fused"] - losses["xla"]).max())
    print(f"max |dloss| over {n_steps} steps: {dmax:.3e}")


if __name__ == "__main__":
    main()
