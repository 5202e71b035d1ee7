"""Headline benchmark: SSP pretraining throughput (images/sec/chip).

Measures the full production training step of the flagship dual-stream
ViT-2SPN configuration (ssp_vit2spn_tiny.py:31-41: microbatch 128, grad
accumulation 8, EMA 0.999) including on-device dual-view augmentation — i.e.
samples/sec through the complete pipeline, where each sample costs
2 augmented views, 4 ViT-Tiny forwards (2 online + 2 EMA targets) and the
backward pass through both online networks.

Baseline: the reference publishes no throughput numbers (BASELINE.md), so the
RTX 6000 per-device figure is estimated analytically:
  per-sample compute ~ (4 fwd + 2 bwd~2x fwd) x 1.08 GMACs x 2 FLOP/MAC
                     ~ 17.3 GFLOPs
  RTX 6000 (Turing) fp16 tensor peak ~ 32.6 TFLOPs at ~30% utilization for
  this small-model workload => ~9.8 TFLOPS => ~565 img/s, input-bound lower
  in practice with 4 CPU aug workers; we use 565 as a generous baseline.
vs_baseline therefore = measured / 565. The BASELINE.json target is >=3x.

Output: one JSON line {"metric", "value", "unit", "vs_baseline"}.

The one-line contract holds under failure too: a backend outage (the axon
tunnel can be down — BENCH_r03.json recorded rc=1 with a raw traceback) gets
a bounded init probe with retries, and any error degrades to ONE parseable
`{"metric", "value": null, ..., "error"}` line on stdout (traceback to
stderr), so a driver artifact is never a stack dump.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import numpy as np

RTX6000_EST_IMG_PER_SEC = 565.0


def main(argv=None) -> None:
    from vit2spn_tpu.core.config import SSPConfig, replace
    from vit2spn_tpu.core.runtime import enable_compilation_cache
    from vit2spn_tpu.data.datasets import synthetic_dataset
    from vit2spn_tpu.train.ssp import SSPTrainer
    from vit2spn_tpu.utils.logging import MetricLogger

    enable_compilation_cache()

    # allow_abbrev=False: _requested_metric() mirrors this parser with an
    # exact-string argv scan for the outage error line; abbreviated flags
    # (`--mod hires`) would parse here but be invisible to that scan,
    # mislabeling a failed run under the default metric name.
    ap = argparse.ArgumentParser(allow_abbrev=False)
    ap.add_argument(
        "--mode", choices=["octmnist", "hires", "inference"],
        default="octmnist",
        help="octmnist: 28 px sources (flagship protocol). hires: 256 px "
        "folder-dataset-shaped sources -> band-limit -> warp "
        "(OCTID/UCSD pipeline cost, ucsdoct_ft_vit2spn.py:30-43). "
        "inference: eval-mode dual-stream feature extraction (the "
        "extract_features/serving path — deterministic eval views, "
        "residual-free fused-backbone primal, no backward).",
    )
    ap.add_argument(
        "--vit", choices=["tiny", "small", "base"], default="tiny",
        help="backbone geometry. tiny is the flagship/reference model; "
        "small/base are framework extensions (same SSP step, dimension-"
        "generic fused kernels with geometry-scaled tile/VMEM defaults) — "
        "the metric gains a _vit<name> suffix and an MFU detail.",
    )
    ap.add_argument(
        "--attn", choices=["default", "fused", "xla"], default="default",
        help="attention/backbone implementation: default resolves to the "
        "fused whole-backbone Pallas kernel on TPU; xla forces the plain "
        "XLA path — the one tensor-parallel (model_parallel>1) runs "
        "dispatch to — so the TP fallback's single-chip price is one flag "
        "away (metric gains an _attnxla suffix).",
    )
    ap.add_argument("--band-limit", type=int, default=None,
                    help="override augment band_limit (hires tuning)")
    ap.add_argument("--source-shape", default=None, metavar="HxW",
                    help="hires only: non-square decode shape, e.g. 496x512 "
                    "(the raw UCSD scan aspect); default 256x256")
    ap.add_argument("--cold", action="store_true",
                    help="hires only: measure ONE cold epoch including host "
                    "JPEG decode + H2D upload of a UCSD-sized folder dataset "
                    "(the cost the reference re-pays EVERY epoch via lazy "
                    "ImageFolder decode; this pipeline pays it once)")
    args = ap.parse_args(argv)

    cfg = SSPConfig(pretrained_init=False)  # full flagship config
    if args.vit != "tiny":
        if args.mode != "octmnist":
            ap.error("--vit only applies to the default (octmnist) mode")
        from vit2spn_tpu.core.config import ViTConfig

        cfg = replace(cfg, vit=getattr(ViTConfig, args.vit)())
    src = 28 if args.mode == "octmnist" else 256
    if args.source_shape:
        if args.mode != "hires":
            ap.error("--source-shape only applies to --mode hires")
        try:
            src = tuple(int(v) for v in args.source_shape.lower().split("x"))
        except ValueError:
            src = ()
        if len(src) != 2 or min(src) <= 0:
            ap.error("--source-shape must be HxW, e.g. 496x512")
    if args.band_limit is not None:
        cfg = replace(cfg, **{"data.augment.band_limit": args.band_limit})
    n_chips = jax.device_count()
    trainer = SSPTrainer(
        cfg, logger=MetricLogger(echo=False),
        attn_impl=None if args.attn == "default" else args.attn,
    )
    if args.cold:
        if args.mode != "hires":
            ap.error("--cold only applies to --mode hires")
        return _bench_cold_epoch(trainer, src if isinstance(src, tuple)
                                 else (src, src))
    ds = synthetic_dataset(
        image_size=src, split_sizes={"train": 4 * cfg.effective_batch}, seed=0
    )

    eff = cfg.effective_batch
    rng = np.random.default_rng(0)

    trainer.attach_dataset(ds.images)  # data lives in HBM; steps ship indices

    n_steps = 10

    if args.mode == "inference":
        return _bench_inference(trainer, ds, rng)

    def run(seed):
        # production path: whole scan of steps in ONE dispatch
        idx_mat = rng.integers(0, len(ds), (n_steps, eff))
        keys = jax.random.split(jax.random.key(seed), n_steps)
        metrics = trainer.train_epoch(idx_mat, keys)
        # float() forces a host fetch (block_until_ready returns early on
        # tunneled runtimes and cannot be trusted for timing)
        return float(metrics["loss"].mean())

    run(0)  # warmup: compile + first execution

    # best of 5 timed repeats: each window ends with ONE host fetch through
    # the ~40 ms tunnel, whose RTT jitter is ±1% of the window — the best
    # repeat is the one with the least fetch-jitter, not a lucky compute run
    # (on-chip step time is stable to <0.1% across repeats; each extra
    # repeat costs ~3 s against a multi-minute compile)
    dt = min(
        (lambda t0: (run(1 + i), time.perf_counter() - t0)[1])(
            time.perf_counter()
        )
        for i in range(5)
    )

    img_per_sec = n_steps * eff / dt
    img_per_sec_chip = img_per_sec / n_chips
    suffix = "" if args.mode == "octmnist" else "_hires"
    if args.attn != "default":
        suffix += f"_attn{args.attn}"
    record = {
        "metric": f"ssp_images_per_sec_per_chip{suffix}",
        "value": round(img_per_sec_chip, 2),
        "unit": "images/s/chip",
        "vs_baseline": round(img_per_sec_chip / RTX6000_EST_IMG_PER_SEC, 3),
    }
    if args.vit != "tiny":
        # model-family extension: the RTX estimate is per-FLOP, so scale the
        # per-image baseline by the geometry's step FLOPs; report true MFU
        # (analytic matmul FLOPs INCLUDING the attention einsums fvcore
        # skips — the canonical Tiny 17.3 GFLOP/img figure excludes them)
        from vit2spn_tpu.core.config import ViTConfig

        g = _step_gflops_per_img(cfg.vit)
        g_tiny = _step_gflops_per_img(ViTConfig())
        record["metric"] += f"_vit{args.vit}"
        record["vs_baseline"] = round(
            img_per_sec_chip / (RTX6000_EST_IMG_PER_SEC * g_tiny / g), 3
        )
        record["detail"] = {
            "model": f"vit-{args.vit}",
            "step_gflops_per_img": round(g, 2),
            "mfu_vs_197tflops_bf16": round(
                img_per_sec_chip * g / 197_000, 4
            ),
        }
    print(json.dumps(record))


def _step_gflops_per_img(vit) -> float:
    """Analytic matmul FLOPs of one SSP training step per image: 4 forwards
    (2 online + 2 EMA targets) + 2 recompute-backwards at ~2x forward each
    = 8 forward-equivalents (the ratio bench/profiling measured on chip)."""
    s, d, mlp = vit.seq_len, vit.hidden_size, vit.mlp_dim
    per_layer = (
        2 * s * d * 3 * d          # qkv projection
        + 2 * s * s * d            # attention scores
        + 2 * s * s * d            # attention-weighted values
        + 2 * s * d * d            # output projection
        + 2 * s * d * mlp * 2      # MLP up + down
    )
    patch = 2 * vit.num_patches * (vit.patch_size ** 2 * 3) * d
    return 8 * (vit.num_layers * per_layer + patch) / 1e9


def _requested_metric(argv) -> str:
    """Mirror main()'s metric naming for the error line, from an argv scan
    only — it must work when the backend (and thus main()) can't even
    initialize. Keeps a failed `--mode hires` / `--vit base` run from
    reporting an error under the DEFAULT metric's name."""
    def val(flag, default):
        # last occurrence wins, matching argparse's overwrite semantics
        # (main() rejects abbreviations via allow_abbrev=False, so the
        # exact-string scan here is a faithful mirror)
        out = default
        for i, a in enumerate(argv):
            if a == flag and i + 1 < len(argv):
                out = argv[i + 1]
            elif a.startswith(flag + "="):
                out = a.split("=", 1)[1]
        return out

    mode = val("--mode", "octmnist")
    if mode == "inference":
        return "ssp_inference_images_per_sec_per_chip"
    if mode == "hires" and "--cold" in argv:
        return "ssp_cold_epoch_images_per_sec_per_chip_hires"
    name = "ssp_images_per_sec_per_chip"
    if mode == "hires":
        name += "_hires"
    attn = val("--attn", "default")
    if attn != "default":
        name += f"_attn{attn}"
    vit = val("--vit", "tiny")
    if vit != "tiny":
        name += f"_vit{vit}"
    return name


def _probe_backend(retries: int = None, timeout_s: float = None,
                   wait_s: float = None):
    """Bounded backend-init probe in a SUBPROCESS: a broken tunnel can HANG
    device init (observed during the round-3 axon outage), not just raise,
    so an in-process try/except cannot bound it. Returns None when a device
    backend comes up, else a one-line error description.

    Defaults come from VIT2SPN_PROBE_{RETRIES,TIMEOUT_S,WAIT_S} (so the
    contract test — and an impatient operator — can shrink the backoff)."""
    import subprocess
    import sys as _sys

    env = os.environ
    if retries is None:
        retries = int(env.get("VIT2SPN_PROBE_RETRIES", 3))
    if timeout_s is None:
        timeout_s = float(env.get("VIT2SPN_PROBE_TIMEOUT_S", 240.0))
    if wait_s is None:
        wait_s = float(env.get("VIT2SPN_PROBE_WAIT_S", 30.0))
    last = "unknown"
    for i in range(retries):
        try:
            r = subprocess.run(
                [_sys.executable, "-c",
                 "import jax; print(jax.devices())"],
                capture_output=True, text=True, timeout=timeout_s,
            )
            if r.returncode == 0:
                return None
            tail = (r.stderr or "").strip().splitlines()
            last = tail[-1] if tail else f"device init exited rc={r.returncode}"
        except subprocess.TimeoutExpired:
            last = f"device init timed out after {timeout_s:g}s"
        if i + 1 < retries:
            time.sleep(wait_s)
    return last


def _bench_cold_epoch(trainer, shape) -> None:
    """UCSD-protocol-shaped COLD epoch: 2000 grayscale JPEGs at the raw scan
    aspect (e.g. 496x512) decoded on host (PIL, 1 vCPU), uploaded to HBM,
    and trained for one full epoch — the end-to-end cost of the first epoch
    of `run ft-ucsdoct` on a fresh folder (ucsdoct_ft_vit2spn.py:30-43 input
    shapes). The reference's lazy ImageFolder re-decodes on CPU workers
    EVERY epoch; this pipeline decodes once and keeps uint8 sources
    device-resident, so the metric reports the cold epoch (decode + H2D +
    train) with the warm steady-state epoch in `detail` for contrast."""
    import os
    import shutil
    import tempfile

    from PIL import Image

    from vit2spn_tpu.data.datasets import _load_folder, synthetic_dataset

    n_imgs = 2000  # UCSD fine-tune subset size (ucsdoct_ft_vit2spn.py:52)
    h, w = shape
    src_ds = synthetic_dataset(image_size=(h, w), num_classes=4,
                               split_sizes={"all": n_imgs}, seed=0)
    tmp = tempfile.mkdtemp(prefix="vit2spn_cold_")
    try:
        for i, (img, lab) in enumerate(zip(src_ds.images, src_ds.labels)):
            d = os.path.join(tmp, f"class_{lab}")
            os.makedirs(d, exist_ok=True)
            Image.fromarray(img[..., 0], mode="L").save(
                os.path.join(d, f"{i:05d}.jpg"), quality=90)

        eff = trainer.cfg.effective_batch
        # cover ALL n_imgs decoded images per epoch (ceil, wraparound pad) —
        # floor would train only 1024 of the 2000 while charging the full
        # decode against them
        n_steps = -(-n_imgs // eff)

        def epoch(seed, images=None):
            if images is not None:
                trainer.attach_dataset(images)
            idx = np.resize(
                np.random.default_rng(seed).permutation(n_imgs), n_steps * eff
            ).reshape(n_steps, eff)
            keys = jax.random.split(jax.random.key(seed), n_steps)
            m = trainer.train_epoch(idx, keys)
            return float(m["loss"].mean())  # forces the host fetch

        epoch(0, src_ds.images)  # compile + warmup on identical shapes

        t0 = time.perf_counter()
        folder = _load_folder(tmp, "cold", source_size=(h, w))
        t_decode = time.perf_counter() - t0
        epoch(1, folder.images)  # attach (H2D) + one epoch
        t_cold = time.perf_counter() - t0

        t1 = time.perf_counter()
        epoch(2)  # warm: data already device-resident
        t_warm = time.perf_counter() - t1
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    n_chips = jax.device_count()
    trained = n_steps * eff
    # numerator = UNIQUE decoded images (n_imgs), matching the metric's
    # narrative; the ceil-covered epoch trains `trained` samples (wraparound
    # pad duplicates included) — reported in detail, not in the headline
    print(
        json.dumps(
            {
                "metric": "ssp_cold_epoch_images_per_sec_per_chip_hires",
                "value": round(n_imgs / t_cold / n_chips, 2),
                "unit": "images/s/chip",
                # the RTX baseline is a steady-state TRAINING estimate; the
                # cold epoch has no published counterpart — labeled clearly
                "vs_train_baseline": round(
                    n_imgs / t_cold / n_chips / RTX6000_EST_IMG_PER_SEC, 3
                ),
                "detail": {
                    "source_shape": f"{h}x{w}",
                    "n_images": n_imgs,
                    "trained_samples": trained,
                    "host_decode_s": round(t_decode, 2),
                    "cold_epoch_s": round(t_cold, 2),
                    "warm_epoch_s": round(t_warm, 2),
                    "warm_images_per_sec_per_chip": round(
                        trained / t_warm / n_chips, 2
                    ),
                },
            }
        )
    )


def _bench_inference(trainer, ds, rng) -> None:
    """Eval-path throughput: dual-view deterministic transform + 4-backbone
    eval forward + heads (the `extract_features` parity path,
    dsn_ssn/ssp_single.py:140-156) over device-resident data — i.e. offline
    batched inference/serving. No backward, residual-free fused primal."""
    import dataclasses as dc

    import jax.numpy as jnp

    from vit2spn_tpu.core import rng as rngmod
    from vit2spn_tpu.data.augment import dual_view_batch
    from vit2spn_tpu.models.ssp import dual_stream_forward

    cfg, policy = trainer.cfg, trainer.policy
    aug_eval = dc.replace(cfg.data.augment, enabled=False)
    norm_fold = (cfg.data.augment.normalize_mean, cfg.data.augment.normalize_std)
    images = trainer._device_images
    batch, n_steps = 1024, 10

    @jax.jit
    def run_fn(params, images, idx_mat, key):
        def body(acc, idx):
            mb = jnp.take(images, idx, axis=0)
            v1, v2 = dual_view_batch(
                key, mb, aug_eval, out_dtype=policy.compute_dtype,
                fold_normalize=True,
            )
            pred, _ = dual_stream_forward(
                params, v1, v2, cfg, policy, train=False,
                attn_impl=trainer.attn_impl, norm_fold=norm_fold,
            )
            return acc + jnp.sum(pred.astype(jnp.float32)), None

        acc, _ = jax.lax.scan(body, jnp.zeros(()), idx_mat)
        return acc

    def run(seed):
        idx_mat = rng.integers(0, len(ds), (n_steps, batch))
        out = run_fn(
            trainer.state.params, images, jnp.asarray(idx_mat),
            rngmod.fold(rngmod.root_key(cfg.seed), 31337, seed),
        )
        return float(out)  # force the host fetch

    run(0)  # compile + warmup
    dt = min(
        (lambda t0: (run(1 + i), time.perf_counter() - t0)[1])(
            time.perf_counter()
        )
        for i in range(3)
    )
    img_per_sec_chip = n_steps * batch / dt / jax.device_count()
    print(
        json.dumps(
            {
                "metric": "ssp_inference_images_per_sec_per_chip",
                "value": round(img_per_sec_chip, 2),
                "unit": "images/s/chip",
                # no published inference baseline exists; the ratio against the
                # TRAINING estimate is labeled as such so it can't be misquoted
                "vs_train_baseline": round(
                    img_per_sec_chip / RTX6000_EST_IMG_PER_SEC, 3
                ),
            }
        )
    )


if __name__ == "__main__":
    import sys

    err = _probe_backend()
    if err is None:
        try:
            main()
            sys.exit(0)
        except SystemExit:
            raise  # argparse usage errors keep their own exit path
        except Exception as e:  # noqa: BLE001 — stdout stays one JSON line
            import traceback

            traceback.print_exc()  # full detail to stderr only
            err = f"{type(e).__name__}: {e}"
    print(json.dumps({
        "metric": _requested_metric(sys.argv[1:]),
        "value": None,
        "unit": "images/s/chip",
        "vs_baseline": None,
        "error": err,
    }))
    sys.exit(1)
