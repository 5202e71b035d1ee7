"""Command-line interface.

One runnable command per reference script (SURVEY.md section 7):

  vit2spn presets                         list all presets
  vit2spn run ssp                         == python ssp_vit2spn_tiny.py
  vit2spn run ssp-single                  == dsn_ssn/ssp_single.py
  vit2spn run ssp-scratch                 == ssp_ssl/ssl_vit2spn_scratch.py
  vit2spn run ft-octmnist                 == octmnist_ft_vit2spn.py
  vit2spn run multitrial/ft-octmnist      == multitrial/octmnist_ft_vit2spn.py
  vit2spn data stats octmnist             == preprocessing/octmnist_dataset.py
  vit2spn data merge-ucsd ./datasets/ucsdoct  == preprocessing/merge_ucsdoct.py
  vit2spn plot radar --kind pt-scratch    == plotting/pt_scratch_radar.py
  vit2spn convert export.npz export.pth   backbone interop with the
                                          reference's .pth contract (both
                                          directions)
  vit2spn extract ssp-single --out f.npz  online features over a dataset
                                          (extract_online_features surface,
                                          dsn_ssn/ssp_single.py:140-156)
  vit2spn inspect ckpt.npz                keys/shapes/dtypes + metadata of a
                                          checkpoint (.npz/.pth/.safetensors)

Config overrides use dotted keys: `vit2spn run ssp -o epochs=5 -o
data.root=/data -o mesh.model_parallel=2`. The model-zoo shorthand
`-o vit=small` / `-o vit=base` swaps the whole backbone geometry
(framework extension; the reference is ViT-Tiny-only).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import jax
import numpy as np

from vit2spn_tpu.core.config import FineTuneConfig, SSPConfig, replace
from vit2spn_tpu.core.presets import PRESETS, get_preset


def _parse_override(s: str):
    key, _, raw = s.partition("=")
    if not _:
        raise ValueError(f"override must be key=value, got {s!r}")
    try:
        val = json.loads(raw)
    except json.JSONDecodeError:
        val = raw
    return key, val


def _apply_overrides(cfg, overrides):
    for item in overrides or []:
        key, val = _parse_override(item)
        if key == "vit" and isinstance(val, str):
            # model-zoo shorthand: -o vit=small swaps the backbone GEOMETRY
            # (hidden/heads/mlp — framework extension; the reference is
            # Tiny-only). Applied as a dataclasses.replace on the current
            # cfg.vit so preset- or earlier-override-customized fields
            # (remat, image_size, feature semantics, ...) survive; dotted
            # overrides after it still apply on top.
            import dataclasses as _dc

            from vit2spn_tpu.core.config import ViTConfig

            if val not in ("tiny", "small", "base"):
                raise ValueError(
                    f"unknown vit variant {val!r} (tiny|small|base)"
                )
            geom = ViTConfig() if val == "tiny" else getattr(ViTConfig, val)()
            val = _dc.replace(
                cfg.vit,
                hidden_size=geom.hidden_size,
                num_heads=geom.num_heads,
                mlp_dim=geom.mlp_dim,
            )
        cfg = replace(cfg, **{key: val})
    return cfg


def _resolve_backbone(cfg: FineTuneConfig, logger):
    """Fine-tune initialization source (SURVEY.md checkpoint dataflow):
    ssp/ssp-single/scratch load the corresponding SSP export; imagenet loads
    the HF checkpoint (sl_ssp/sl_* baseline); random trains from scratch."""
    from vit2spn_tpu.models.vit import init_vit
    from vit2spn_tpu.train import checkpoint as ckpt

    init = cfg.init
    if init == "random":
        return None
    if init == "imagenet":
        try:
            from vit2spn_tpu.models.hf_convert import load_pretrained_vit_tiny

            # init_path may point at a local .safetensors/.npz state dict or
            # an HF model directory (models/hf_convert.py)
            return load_pretrained_vit_tiny(cfg.vit, path=cfg.init_path)
        except Exception as e:  # noqa: BLE001
            logger.log("warning", message=f"imagenet init unavailable ({e}); random init")
            return None
    name = {
        "ssp": "octmnist_vit2spn_tiny_model",
        "ssp-single": "octmnist_vitspn_tiny_model",
        "scratch": "octmnist_vit2spn_tiny_scratch_model",
    }.get(init, init)
    path = cfg.init_path or os.path.join(
        SSPConfig().checkpoint_dir, name + ".npz"
    )
    if not ckpt.exists(path):
        logger.log(
            "warning",
            message=f"SSP export {path} not found; run `vit2spn run ssp` "
            "first. Falling back to imagenet/random init.",
        )
        try:
            from vit2spn_tpu.models.hf_convert import load_pretrained_vit_tiny

            return load_pretrained_vit_tiny(cfg.vit)
        except Exception:  # noqa: BLE001
            return None
    if path.endswith((".pth", ".pt", ".safetensors")):
        # the reference's own export artifact (torch state dict with
        # `vit.`-prefixed HF keys, ssp_vit2spn_tiny.py:246) — migration path
        # for users with existing reference checkpoints
        from vit2spn_tpu.models.hf_convert import load_pretrained_vit_tiny

        return load_pretrained_vit_tiny(cfg.vit, path=path)
    if path.endswith(".npz"):
        import numpy as _np

        with _np.load(path) as f:
            is_pytree = any("/" in k for k in f.files)
        if not is_pytree:  # HF-named .npz (dot keys) — route to the converter
            from vit2spn_tpu.models.hf_convert import (
                convert_hf_state_dict,
                load_local_state,
            )

            return convert_hf_state_dict(load_local_state(path), cfg.vit)
    # STRICT like the reference's fine-tune ingest (load_state_dict default,
    # octmnist_ft_vit2spn.py:190): a key mismatch (wrong file, different vit
    # geometry, a full training checkpoint instead of a backbone export) must
    # error loudly, not silently fine-tune a random init
    template = init_vit(jax.random.key(0), cfg.vit)
    return ckpt.restore(path, template, strict=True)


def cmd_run(args):
    import contextlib

    from vit2spn_tpu.utils.logging import MetricLogger

    cfg = _apply_overrides(get_preset(args.preset), args.override)
    out_dir = args.output_dir or getattr(cfg, "checkpoint_dir", "./output")
    os.makedirs(out_dir, exist_ok=True)
    logger = MetricLogger(
        os.path.join(out_dir, "metrics.jsonl"),
        tb_dir=os.path.join(out_dir, "tb") if getattr(args, "tb", False)
        else None,
    )

    profile_cm = contextlib.nullcontext()
    if getattr(args, "profile", False):
        from vit2spn_tpu.utils.profiling import op_breakdown, trace

        trace_dir = os.path.join(out_dir, "trace")
        profile_cm = trace(trace_dir)
    with profile_cm:
        rc = _run_experiment(cfg, args, out_dir, logger)
    if getattr(args, "profile", False):
        for src, us, n in op_breakdown(trace_dir, top=15):
            logger.log("profile_op", source=src[-80:], total_us=us, count=n)
    return rc


def _run_experiment(cfg, args, out_dir, logger):

    if isinstance(cfg, SSPConfig):
        from vit2spn_tpu.data.datasets import load_dataset
        from vit2spn_tpu.evals.plots import loss_curve
        from vit2spn_tpu.train.ssp import SSPTrainer

        from vit2spn_tpu.utils.flops import dual_stream_report

        ds = load_dataset(cfg.data.name, root=cfg.data.root)
        train = ds.split("train") if "train" in ds.splits else ds
        trainer = SSPTrainer(cfg, logger=logger)
        # startup introspection (ssp_vit2spn_tiny.py:178-194,235-239)
        logger.log("model_info", **dual_stream_report(cfg, trainer.state.params))
        from vit2spn_tpu.utils.profiling import device_memory_report

        # best-effort with a watchdog budget: the flagship entry path must
        # reach the trainer even if a degraded tunnel hangs the stats RPC
        mem = device_memory_report(timeout_s=20.0)
        if mem:  # backends without memory stats (CPU/axon) report nothing
            logger.log("device_memory", **mem)
        history = trainer.fit(
            train,
            epochs=args.epochs,
            checkpoint_path=os.path.join(out_dir, "checkpoint.npz"),
        )
        trainer.export_backbone(os.path.join(out_dir, cfg.export_name + ".npz"))
        if not cfg.pretrained_init:  # scratch variant plots its loss curve
            loss_curve(history, os.path.join(out_dir, "ssp_loss_curve.png"))
        return 0

    assert isinstance(cfg, FineTuneConfig)
    from vit2spn_tpu.evals.metrics import classification_report_text
    from vit2spn_tpu.evals.plots import confusion_matrix_plot, roc_all_folds
    from vit2spn_tpu.evals.protocol import run_cv_protocol, run_multitrial

    backbone = _resolve_backbone(cfg, logger)
    if cfg.num_trials > 1:
        run_multitrial(cfg, backbone_params=backbone, logger=logger,
                       epochs=args.epochs,
                       resume_path=os.path.join(out_dir, "multitrial_state.json"))
    else:
        res = run_cv_protocol(cfg, backbone_params=backbone, logger=logger,
                              epochs=args.epochs)
        # artifact names match the reference's per-script savefig targets
        # (octmnist_ft_vit2spn.py:166,226; ucsdoct_ft_vit2spn.py:248,331 —
        # the octird script reuses "octmnist_*" names, a copy-paste slip we
        # deviate from; MIGRATION.md artifact table)
        roc_all_folds(
            res.fold_rocs, res.fold_aucs,
            os.path.join(out_dir, f"{cfg.data.name}_roc_curve_all_folds.png"),
        )
        class_names = list(res.test_summary["per_class"])
        confusion_matrix_plot(
            res.test_summary["confusion_matrix"],
            class_names,
            os.path.join(out_dir, f"{cfg.data.name}_confusion_matrix.png"),
        )
        # the reference PRINTS sklearn's classification_report at test eval
        # (octmnist_ft_vit2spn.py:168); keep the stdout parity and persist
        # it as a text artifact too
        report = classification_report_text(res.test_summary)
        print(report)
        with open(os.path.join(
                out_dir, f"{cfg.data.name}_classification_report.txt"
        ), "w") as f:
            f.write(report)
        _save_cv_result(res, cfg, out_dir)
    return 0


# Max stored points per ROC curve in <ds>_cv_result.json. Real-data runs
# produce one threshold per distinct score (thousands × 10 folds × classes →
# tens of MB); the figures are the contract (octmnist_ft_vit2spn.py:217-227),
# and at the rendered size (10×8 in @ 100 dpi = 1000 px wide) curves above
# this density are visually exact after endpoint-preserving decimation.
_ROC_MAX_POINTS = 512


def _decimate_curve(arr) -> list:
    a = np.asarray(arr, dtype=np.float64)
    if a.size <= _ROC_MAX_POINTS:
        return a.tolist()
    idx = np.unique(np.round(
        np.linspace(0, a.size - 1, _ROC_MAX_POINTS)
    ).astype(int))
    return a[idx].tolist()


def _save_cv_result(res, cfg, out_dir: str) -> str:
    """Persist the protocol result so `vit2spn plot roc|cm` can re-render the
    reference's figures without re-running hours of fine-tuning."""
    payload = {
        "dataset": cfg.data.name,
        "class_names": list(res.test_summary["per_class"]),
        "fold_aucs": [float(a) for a in res.fold_aucs],
        "best_fold": res.best_fold,
        "confusion_matrix": np.asarray(
            res.test_summary["confusion_matrix"]
        ).tolist(),
        # fpr/tpr of one curve share a length, so _decimate_curve's
        # size-determined index set keeps the (fpr[i], tpr[i]) pairs aligned
        "fold_rocs": {
            str(fold): {
                "fpr": {str(c): _decimate_curve(v) for c, v in fpr.items()},
                "tpr": {str(c): _decimate_curve(v) for c, v in tpr.items()},
                "auc": {str(c): float(v) for c, v in aucs.items()},
            }
            for fold, (fpr, tpr, aucs) in res.fold_rocs.items()
        },
    }
    path = os.path.join(out_dir, f"{cfg.data.name}_cv_result.json")
    with open(path, "w") as f:
        json.dump(payload, f)
    return path


def cmd_presets(_args):
    for name in sorted(PRESETS):
        cfg = PRESETS[name]
        kind = "ssp" if isinstance(cfg, SSPConfig) else "finetune"
        print(f"{name:32s} [{kind}] {cfg.data.name}")
    return 0


def cmd_data(args):
    from vit2spn_tpu.utils.logging import MetricLogger

    if args.data_cmd == "stats":
        from vit2spn_tpu.data.datasets import load_dataset
        from vit2spn_tpu.data.stats import write_summary

        ds = load_dataset(args.dataset, root=args.root)
        path = write_summary(ds, args.out)
        print(f"summary written to {path}")
        return 0
    if args.data_cmd == "merge-ucsd":
        from vit2spn_tpu.data.merge import merge_ucsd_folders

        stats = merge_ucsd_folders(args.root)
        print(json.dumps(stats, indent=2))
        return 0
    raise SystemExit(f"unknown data command {args.data_cmd}")


def cmd_parity(args):
    """Real-data parity runbook (evals/parity.py): one command that checks
    input availability, runs the published chain (SSP 100-epoch → the three
    fine-tune CV protocols → multitrial), and writes
    parity_report.{json,md} comparing measured mAUC/accuracy to the
    published table (README.md:10,46), with the pred_std collapse
    diagnostic flagged. Resumable at every expensive stage."""
    from vit2spn_tpu.evals.parity import run_parity

    report = run_parity(
        data_root=args.data_root,
        out_dir=args.out,
        smoke=args.smoke,
        epochs=args.epochs,
        ft_epochs=args.ft_epochs,
        tol=args.tol,
        skip_multitrial=args.skip_multitrial,
        shrink_geometry=args.shrink_geometry,
    )
    print(json.dumps({"status": report["status"],
                      "report": os.path.join(args.out, "parity_report.md")}))
    if not report["datasets"]:
        return 2  # nothing runnable: the report says what to provide
    # a shrunk-geometry rehearsal PASS carries a "(shrunk geometry ...)"
    # suffix; INPUTS-INCOMPLETE / FAIL: ... exit 1
    return 0 if (args.smoke or report["status"].startswith("PASS")) else 1


def cmd_plot(args):
    if args.plot_cmd == "radar":
        from vit2spn_tpu.evals.plots import (
            PT_SCRATCH_RESULTS,
            SSP_SP_RESULTS,
            radar_chart,
        )

        results = {"pt-scratch": PT_SCRATCH_RESULTS,
                   "ssp-sp": SSP_SP_RESULTS}[args.kind]
        path = radar_chart(results, args.out)
        print(f"radar chart written to {path}")
        return 0

    # roc / cm: standalone re-renders of the reference's per-script figures
    # (octmnist_ft_vit2spn.py:217-227 ROC-all-folds; :161-167 confusion
    # matrix) from a persisted <ds>_cv_result.json (written by `vit2spn run`)
    if not args.result:
        print("plot roc/cm needs --result <ds>_cv_result.json "
              "(written by `vit2spn run ft-*`)", file=sys.stderr)
        return 2
    with open(args.result) as f:
        payload = json.load(f)
    if args.plot_cmd == "roc":
        from vit2spn_tpu.evals.plots import roc_all_folds

        fold_rocs = {
            int(fold): (
                {int(c): np.asarray(v) for c, v in d["fpr"].items()},
                {int(c): np.asarray(v) for c, v in d["tpr"].items()},
                {int(c): float(v) for c, v in d["auc"].items()},
            )
            for fold, d in payload["fold_rocs"].items()
        }
        path = roc_all_folds(fold_rocs, payload["fold_aucs"], args.out,
                             class_index=args.class_index)
        print(f"roc curve written to {path}")
        return 0
    assert args.plot_cmd == "cm"
    from vit2spn_tpu.evals.plots import confusion_matrix_plot

    path = confusion_matrix_plot(
        np.asarray(payload["confusion_matrix"]),
        payload["class_names"],
        args.out,
    )
    print(f"confusion matrix written to {path}")
    return 0


def cmd_extract(args):
    """Feature extraction / serving surface: run the online network over a
    dataset in eval mode and write (features, labels) to an .npz.

    Parity target: `extract_online_features` (dsn_ssn/ssp_single.py:140-156)
    — the reference defines it (prediction-head output, eval mode, no grad)
    but never surfaces it; here it is a first-class command. The TPU path is
    the residual-free fused primal (14,899 img/s/chip, VALIDATION.md)."""
    from vit2spn_tpu.data.datasets import load_dataset
    from vit2spn_tpu.train import checkpoint as ckpt
    from vit2spn_tpu.train.ssp import SSPTrainer
    from vit2spn_tpu.utils.logging import MetricLogger

    cfg = _apply_overrides(get_preset(args.preset), args.override)
    if not isinstance(cfg, SSPConfig):
        print(f"extract needs an SSP preset, got {args.preset!r}", file=sys.stderr)
        return 2
    logger = MetricLogger()
    trainer = SSPTrainer(cfg, logger=logger)
    path = args.checkpoint or os.path.join(cfg.checkpoint_dir, "checkpoint.npz")
    if ckpt.exists(path):
        trainer.state = jax.device_put(
            ckpt.restore(path, trainer.state), trainer._state_sharding
        )
        logger.log("restore", path=path)
    else:
        logger.log(
            "warning",
            message=f"checkpoint {path} not found; extracting from the "
            "initial (pretrained/random) weights",
        )
    ds = load_dataset(cfg.data.name, root=cfg.data.root)
    if args.split is None:  # default: train split when present, else whole
        split = ds.split("train") if "train" in ds.splits else ds
    elif args.split in ds.splits:
        split = ds.split(args.split)
    elif args.split == "all":
        split = ds
    else:
        # an EXPLICIT unknown split must error — silently extracting the
        # whole dataset would mislabel the features file
        print(
            f"unknown split {args.split!r} for dataset {ds.name!r} "
            f"(available: {sorted(ds.splits) or ['all']})",
            file=sys.stderr,
        )
        return 2
    feats, labels = trainer.extract_features(
        split, batch_size=args.batch_size, augment=args.augment,
        features=args.features,
    )
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    np.savez(args.out, features=feats, labels=labels)
    print(f"{feats.shape[0]} x {feats.shape[1]} features -> {args.out}")
    return 0


def cmd_convert(args):
    """Backbone checkpoint interop: convert between our .npz export format
    and the reference's torch .pth inter-script contract, either direction
    (ssp_vit2spn_tiny.py:246 <-> octmnist_ft_vit2spn.py:190)."""
    from vit2spn_tpu.models.hf_convert import (
        convert_hf_state_dict,
        export_reference_pth,
        load_local_state,
    )
    from vit2spn_tpu.models.vit import init_vit
    from vit2spn_tpu.train import checkpoint as ckpt

    vit_cfg = _apply_overrides(SSPConfig(), args.override).vit
    src, dst = args.src, args.dst

    if src.endswith(".npz"):
        with np.load(src) as f:
            is_pytree = any("/" in k for k in f.files)
    else:
        is_pytree = False
    if is_pytree:
        # our path-flattened pytree export; STRICT: a mismatched source
        # (full training checkpoint, different geometry) must error, not
        # silently export the random template as a "converted" .pth
        params = ckpt.restore(src, init_vit(jax.random.key(0), vit_cfg),
                              strict=True)
    else:  # HF-named state dict: .pth/.pt/.safetensors or an HF-keyed .npz
        params = convert_hf_state_dict(load_local_state(src), vit_cfg)

    if dst.endswith((".pth", ".pt")):
        export_reference_pth(jax.device_get(params), vit_cfg, dst)
    elif dst.endswith(".npz"):
        ckpt.save(dst, jax.device_get(params),
                  {"format": "vit_backbone", "source": src})
    else:
        print(f"unsupported output format {dst!r} (.pth, .pt or .npz)",
              file=sys.stderr)
        return 2
    print(f"converted {src} -> {dst}")
    return 0


def cmd_inspect(args):
    """Print a checkpoint's keys/shapes/dtypes + metadata without loading a
    model — the diagnostic companion to the STRICT interop loads (a strict
    KeyError names only the first few mismatches; this shows everything).
    Handles our .npz exports/checkpoints and torch/.safetensors state
    dicts."""
    path = args.path
    if path.endswith(".npz"):
        rows, meta = [], {}
        with np.load(path) as f:
            for k in sorted(f.files):
                if k == "__metadata__":  # uint8-encoded JSON (checkpoint.py)
                    meta = json.loads(f[k].tobytes().decode())
                    continue
                arr = f[k]
                rows.append((k, tuple(arr.shape), str(arr.dtype),
                             arr.nbytes))
    elif path.endswith((".pth", ".pt", ".safetensors")):
        from vit2spn_tpu.models.hf_convert import load_local_state

        state = load_local_state(path)
        rows = [(k, tuple(np.shape(v)), str(np.asarray(v).dtype),
                 np.asarray(v).nbytes) for k, v in sorted(state.items())]
        meta = {}
    else:
        print(f"unsupported checkpoint format {path!r}", file=sys.stderr)
        return 2
    for k, shape, dtype, _ in rows:
        print(f"{k}  {shape}  {dtype}")
    total = sum(r[3] for r in rows)
    n_params = sum(int(np.prod(r[1])) for r in rows if r[1])
    print(f"-- {len(rows)} arrays, {n_params:,} elements, "
          f"{total / 2**20:.1f} MiB", file=sys.stderr)
    if meta:
        print(f"-- metadata: {json.dumps(meta)}", file=sys.stderr)
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="vit2spn", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    r = sub.add_parser("run", help="run a preset experiment")
    r.add_argument("preset", choices=sorted(PRESETS))
    r.add_argument("--epochs", type=int, default=None,
                   help="override epoch count (e.g. smoke runs)")
    r.add_argument("--output-dir", default=None)
    r.add_argument("-o", "--override", action="append",
                   help="dotted config override key=value")
    r.add_argument("--profile", action="store_true",
                   help="capture a device trace + per-op breakdown into "
                        "<output-dir>/trace")
    r.add_argument("--tb", action="store_true",
                   help="mirror numeric metrics to TensorBoard scalars in "
                        "<output-dir>/tb (JSONL is always written)")
    r.set_defaults(fn=cmd_run)

    sub.add_parser("presets", help="list presets").set_defaults(fn=cmd_presets)

    d = sub.add_parser("data", help="dataset tools")
    dsub = d.add_subparsers(dest="data_cmd", required=True)
    st = dsub.add_parser("stats")
    st.add_argument("dataset")
    st.add_argument("--root", default="./datasets")
    st.add_argument("--out", default="./output")
    mg = dsub.add_parser("merge-ucsd")
    mg.add_argument("root")
    d.set_defaults(fn=cmd_data)

    ex = sub.add_parser(
        "extract",
        help="extract online-network features over a dataset (serving path)",
    )
    ex.add_argument("preset", choices=sorted(PRESETS))
    ex.add_argument("--split", default=None,
                    help="dataset split (default: 'train' when the dataset "
                    "has one, else the whole dataset); 'all' = whole "
                    "dataset; an unknown name is an error")
    ex.add_argument("--checkpoint", default=None,
                    help="SSP training checkpoint.npz (default: preset dir)")
    ex.add_argument("--out", default="./output/features.npz")
    ex.add_argument("--batch-size", type=int, default=256)
    ex.add_argument("--features", choices=["pred", "backbone"], default="pred")
    ex.add_argument("--augment", action="store_true",
                    help="reference's augmented dual-view loader instead of "
                         "deterministic resize views")
    ex.add_argument("-o", "--override", action="append")
    ex.set_defaults(fn=cmd_extract)

    cv = sub.add_parser(
        "convert",
        help="convert backbone checkpoints (.npz <-> reference torch .pth)",
    )
    cv.add_argument("src")
    cv.add_argument("dst")
    cv.add_argument("-o", "--override", action="append",
                    help="dotted config override, e.g. vit.hidden_size=192")
    cv.set_defaults(fn=cmd_convert)

    ins = sub.add_parser(
        "inspect",
        help="list a checkpoint's keys/shapes/dtypes + metadata "
        "(.npz / .pth / .safetensors)",
    )
    ins.add_argument("path")
    ins.set_defaults(fn=cmd_inspect)

    pa = sub.add_parser(
        "parity",
        help="real-data parity runbook: run the published chain and compare "
        "to README.md:10's mAUC/accuracy table (resumable; see "
        "evals/parity.py)",
    )
    pa.add_argument("--data-root", default="./datasets")
    pa.add_argument("--out", default="./output/parity")
    pa.add_argument("--smoke", action="store_true",
                    help="synthetic end-to-end plumbing check (tiny model; "
                    "numbers are NOT parity evidence)")
    pa.add_argument("--epochs", type=int, default=None,
                    help="override SSP epoch count (default: preset's 100)")
    pa.add_argument("--ft-epochs", type=int, default=None,
                    help="override fine-tune epoch count (default: preset's)")
    pa.add_argument("--tol", type=float, default=0.02,
                    help="mAUC/accuracy tolerance for the within-tol verdict")
    pa.add_argument("--skip-multitrial", action="store_true")
    pa.add_argument("--shrink-geometry", action="store_true",
                    help="tiny model geometry on the REAL loaders + full "
                    "gating (plumbing rehearsal; a PASS is labelled as NOT "
                    "parity evidence)")
    pa.set_defaults(fn=cmd_parity)

    pl = sub.add_parser("plot", help="reporting figures")
    pl.add_argument("plot_cmd", choices=["radar", "roc", "cm"])
    pl.add_argument("--kind", choices=["pt-scratch", "ssp-sp"], default="pt-scratch")
    pl.add_argument("--result", default=None,
                    help="for roc/cm: a <ds>_cv_result.json from "
                    "`vit2spn run ft-*`")
    pl.add_argument("--class-index", type=int, default=0,
                    help="for roc: class whose one-vs-rest curve is drawn "
                    "per fold (reference plots class 0)")
    pl.add_argument("--out", default="./output/radar.pdf")
    pl.set_defaults(fn=cmd_plot)
    return p


def main(argv=None) -> int:
    from vit2spn_tpu.core.runtime import enable_compilation_cache, report_cache

    enable_compilation_cache()
    args = build_parser().parse_args(argv)
    try:
        rc = args.fn(args)
        report_cache(echo=lambda m: print(m, file=sys.stderr))
        return rc
    except BrokenPipeError:
        # stdout consumer closed early (e.g. `vit2spn presets | head`);
        # redirect the fd so Python's interpreter-exit flush doesn't raise
        import os as _os
        import sys as _sys

        for stream in (_sys.stdout, _sys.stderr):
            fd = _os.open(_os.devnull, _os.O_WRONLY)
            _os.dup2(fd, stream.fileno())
            _os.close(fd)
        return 0


if __name__ == "__main__":
    sys.exit(main())
