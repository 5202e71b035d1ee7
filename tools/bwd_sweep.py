"""Sweep fused-kernel tile/VMEM configs on the real TPU in ONE process.

Each config retraces the train step (env vars are read at trace time inside
fused_block.py). Timing matches bench.py's convention: force a host fetch
(float(...)) since axon's block_until_ready returns early.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONFIGS = [
    # (name, env overrides)
    ("baseline split t4", {}),
    ("split t8 vmem28", {"VIT2SPN_BWD_TILE": "8", "VIT2SPN_BWD_VMEM_MB": "28"}),
    ("merged t8 vmem36", {"VIT2SPN_MERGED_BWD": "1", "VIT2SPN_BWD_TILE": "8",
                          "VIT2SPN_BWD_VMEM_MB": "36"}),
    ("fwd t16 vmem34", {"VIT2SPN_FWD_TILE": "16", "VIT2SPN_FWD_VMEM_MB": "34"}),
]

# every env var fused_block.py reads at trace time — a leaked value that
# isn't cleared here would silently skew EVERY config, including baseline
ENV_KEYS = ["VIT2SPN_BWD_TILE", "VIT2SPN_BWD_VMEM_MB", "VIT2SPN_MERGED_BWD",
            "VIT2SPN_FWD_TILE", "VIT2SPN_FWD_VMEM_MB",
            "VIT2SPN_MLP_BWD_TILE", "VIT2SPN_MLP_BWD_VMEM_MB"]


def main():
    from vit2spn_tpu.core.runtime import enable_compilation_cache

    enable_compilation_cache()
    import jax
    from vit2spn_tpu.core.config import SSPConfig
    from vit2spn_tpu.data.datasets import synthetic_dataset
    from vit2spn_tpu.train.ssp import SSPTrainer
    from vit2spn_tpu.utils.logging import MetricLogger

    cfg = SSPConfig(pretrained_init=False)
    ds = synthetic_dataset(image_size=28,
                           split_sizes={"train": cfg.effective_batch}, seed=0)
    batch = ds.images[: cfg.effective_batch]
    results = []
    for name, env in CONFIGS:
        for k in ENV_KEYS:
            os.environ.pop(k, None)
        os.environ.update(env)
        try:
            tr = SSPTrainer(cfg, logger=MetricLogger(echo=False))
            key = jax.random.key(0)
            t0 = time.time()
            m = tr.train_step(batch, key)
            _ = float(m["loss"])
            compile_s = time.time() - t0
            n = 10
            t0 = time.time()
            for i in range(n):
                m = tr.train_step(batch, jax.random.fold_in(key, i))
            _ = float(m["loss"])
            dt = (time.time() - t0) / n
            ips = batch.shape[0] / dt
            print(f"RESULT {name}: {dt*1e3:.1f} ms/step, {ips:.0f} img/s "
                  f"(compile {compile_s:.0f}s)", flush=True)
            results.append((name, ips))
        except Exception as e:  # noqa: BLE001
            msg = str(e).splitlines()[0][:200]
            print(f"RESULT {name}: FAILED {type(e).__name__}: {msg}",
                  flush=True)
            results.append((name, None))
        tr = None  # drop compiled step + state before the next config
    print("SUMMARY:", results)


if __name__ == "__main__":
    main()
