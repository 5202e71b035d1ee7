import json
import os

import numpy as np
import pytest

from vit2spn_tpu.cli import build_parser, main
from vit2spn_tpu.core.config import FineTuneConfig, SSPConfig
from vit2spn_tpu.core.presets import PRESETS, get_preset


def test_all_presets_resolve():
    assert len(PRESETS) >= 25  # ~one per reference script
    for name in PRESETS:
        cfg = get_preset(name)
        assert isinstance(cfg, (SSPConfig, FineTuneConfig))


def test_ft_presets_uniform_constants():
    """Constants the audited reference scripts share UNIFORMLY (batch 128,
    50 epochs, 10 folds, Adam lr 1e-4, seed 42 — grep-fingerprinted across
    all ~30 scripts, VALIDATION.md constants audit). A preset drifting from
    these is a regression, not a quirk."""
    for name in PRESETS:
        cfg = get_preset(name)
        if not isinstance(cfg, FineTuneConfig):
            continue
        assert cfg.batch_size == 128, name
        assert cfg.epochs == 50, name
        assert cfg.k_folds == 10, name
        assert cfg.learning_rate == 1e-4, name
        assert cfg.seed == 42, name
        assert cfg.head_hidden == 128 and cfg.head_dropout == 0.5, name


def test_preset_families_match_reference_matrix():
    # SSP family (C1-C3)
    assert get_preset("ssp").dual_stream and get_preset("ssp").pretrained_init
    assert not get_preset("ssp-single").dual_stream
    assert get_preset("ssp-single").ema_momentum == 0.99
    assert not get_preset("ssp-scratch").pretrained_init
    # UCSD scheduler variant (ucsdoct_ft_vit2spn.py:288)
    ucsd = get_preset("ft-ucsdoct")
    assert ucsd.plateau_factor == 0.5 and ucsd.plateau_patience == 2
    assert ucsd.data.augment.normalize_mean == (0.5, 0.5, 0.5)
    # dsn_ssn ucsd drops scheduler/early-stop
    assert not get_preset("dsn-ssn/ft-ucsdoct-dual").use_scheduler
    # multitrial shrinks the label budget (multitrial/octmnist:27)
    mt = get_preset("multitrial/ft-octmnist")
    assert mt.data.subset_fraction == pytest.approx(0.00512942)
    assert mt.num_trials == 5
    # sl_ssp: imagenet-init baseline loads no SSP ckpt
    assert get_preset("sl-ssp/sl-octmnist").init == "imagenet"
    assert get_preset("sl-ssp/ssp-octmnist").init == "ssp"
    # ssp_ssl scratch family
    assert get_preset("ssp-ssl/ft-octid-scratch").init == "scratch"
    # ssp_ssl/octmnist_ft.py:231 loads the SCRATCH export, not the ssp one
    assert get_preset("ssp-ssl/ft-octmnist").init == "scratch"


def test_ucsdoct_family_parity():
    """Per-script ucsdoct quirks (grep-verified in the reference):
    0.5/0.5 normalization and the 0.5/2 scheduler are the MAIN script ONLY
    (ucsdoct_ft_vit2spn.py:42,288); all ablation-family ucsdoct scripts use
    ImageNet stats (…:41), and every non-main non-multitrial one passes its
    fine_tune_model neither a scheduler nor a patience counter (…:121);
    multitrial keeps scheduler 0.1/3 + early stop (multitrial/…:244,116)."""
    imagenet = (0.485, 0.456, 0.406)
    main_preset = get_preset("ft-ucsdoct")
    assert main_preset.data.augment.normalize_mean == (0.5, 0.5, 0.5)
    assert main_preset.use_scheduler and main_preset.use_early_stop
    for name in ("dsn-ssn/ft-ucsdoct-dual", "dsn-ssn/ft-ucsdoct-single",
                 "sl-ssp/sl-ucsdoct", "sl-ssp/ssp-ucsdoct",
                 "ssp-ssl/ft-ucsdoct-pt", "ssp-ssl/ft-ucsdoct-scratch"):
        p = get_preset(name)
        assert p.data.augment.normalize_mean == imagenet, name
        assert not p.use_scheduler and not p.use_early_stop, name
        # their Adam takes no weight_decay (…:224) unlike main/multitrial
        assert p.weight_decay == 0.0, name
    mt = get_preset("multitrial/ft-ucsdoct")
    assert mt.weight_decay == 1e-4
    assert mt.data.augment.normalize_mean == imagenet
    assert mt.use_scheduler and mt.use_early_stop
    assert mt.plateau_factor == 0.1 and mt.plateau_patience == 3


def test_cli_presets_command(capsys):
    assert main(["presets"]) == 0
    out = capsys.readouterr().out
    assert "ssp" in out and "ft-octmnist" in out


def test_cli_override_parsing():
    p = build_parser()
    args = p.parse_args(["run", "ssp", "-o", "epochs=3", "-o", "data.name=synthetic"])
    assert args.override == ["epochs=3", "data.name=synthetic"]


def test_cli_vit_variant_override():
    """-o vit=small swaps the whole backbone geometry (model-zoo shorthand);
    later dotted overrides still apply on top."""
    from vit2spn_tpu.cli import _apply_overrides
    from vit2spn_tpu.core.config import SSPConfig

    cfg = _apply_overrides(
        SSPConfig(), ["vit=small", "vit.num_layers=2"]
    )
    assert cfg.vit.hidden_size == 384
    assert cfg.vit.num_heads == 6
    assert cfg.vit.mlp_dim == 1536
    assert cfg.vit.num_layers == 2
    with pytest.raises(ValueError):
        _apply_overrides(SSPConfig(), ["vit=huge"])


def test_cli_vit_variant_preserves_non_geometry_fields():
    """The shorthand is a GEOMETRY swap (hidden/heads/mlp), not a vit-subtree
    reset: earlier overrides of non-geometry fields must survive it."""
    from vit2spn_tpu.cli import _apply_overrides
    from vit2spn_tpu.core.config import SSPConfig

    cfg = _apply_overrides(
        SSPConfig(), ["vit.image_size=96", "vit.num_layers=4", "vit=base"]
    )
    assert cfg.vit.hidden_size == 768
    assert cfg.vit.num_heads == 12
    assert cfg.vit.mlp_dim == 3072
    assert cfg.vit.image_size == 96  # preserved through the swap
    assert cfg.vit.num_layers == 4  # preserved through the swap


def test_cli_data_stats(tmp_path, capsys):
    rc = main(["data", "stats", "synthetic", "--out", str(tmp_path)])
    assert rc == 0
    path = tmp_path / "synthetic_dataset_summary.json"
    assert path.exists()
    summary = json.loads(path.read_text())
    assert summary["num_classes"] == 4
    assert sum(summary["class_distribution"].values()) == summary["num_samples"]


def test_cli_merge_ucsd(tmp_path):
    for split in ("train", "test"):
        for cat in ("CNV", "DME", "DRUSEN", "NORMAL"):
            d = tmp_path / split / cat
            d.mkdir(parents=True)
            (d / f"{split}_img.jpg").write_bytes(b"fake")
    rc = main(["data", "merge-ucsd", str(tmp_path)])
    assert rc == 0
    for cat in ("CNV", "DME", "DRUSEN", "NORMAL"):
        files = sorted(os.listdir(tmp_path / cat))
        assert files == ["test_img.jpg", "train_img.jpg"]


def test_cli_plot_radar(tmp_path):
    pytest.importorskip("matplotlib")
    out = str(tmp_path / "radar.pdf")
    rc = main(["plot", "radar", "--kind", "pt-scratch", "--out", out])
    assert rc == 0
    assert os.path.getsize(out) > 0


def test_cli_convert_roundtrip(tmp_path):
    """`vit2spn convert` moves a backbone export .npz -> reference .pth ->
    .npz with every leaf preserved bit-exactly (the inter-script checkpoint
    contract, ssp_vit2spn_tiny.py:246 / octmnist_ft_vit2spn.py:190)."""
    pytest.importorskip("torch")
    import jax

    from vit2spn_tpu.train import checkpoint as ckpt
    from vit2spn_tpu.models.vit import init_vit
    from vit2spn_tpu.core.config import ViTConfig

    cfg = ViTConfig(image_size=32, patch_size=16, hidden_size=24,
                    num_layers=2, num_heads=2, mlp_dim=48)
    params = init_vit(jax.random.key(5), cfg)
    src = str(tmp_path / "export.npz")
    ckpt.save(src, jax.device_get(params), {"format": "vit_backbone"})

    ov = [f"vit.{k}={getattr(cfg, k)}" for k in
          ("image_size", "patch_size", "hidden_size", "num_layers",
           "num_heads", "mlp_dim")]
    pth = str(tmp_path / "export.pth")
    back = str(tmp_path / "back.npz")
    assert main(["convert", src, pth, *sum((["-o", o] for o in ov), [])]) == 0
    assert main(["convert", pth, back, *sum((["-o", o] for o in ov), [])]) == 0

    a = ckpt.restore(src, init_vit(jax.random.key(0), cfg))
    b = ckpt.restore(back, init_vit(jax.random.key(0), cfg))
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_cli_extract(tmp_path):
    """`vit2spn extract`: the extract_online_features surface
    (dsn_ssn/ssp_single.py:140-156) — eval-mode online prediction-head
    features over a dataset, written to .npz with labels."""
    out = str(tmp_path / "feats.npz")
    tiny = ["-o", "data.name=synthetic", "-o", "batch_size=8",
            "-o", "vit.image_size=32", "-o", "vit.hidden_size=32",
            "-o", "vit.num_layers=2", "-o", "vit.num_heads=2",
            "-o", "vit.mlp_dim=64", "-o", "data.augment.out_size=32",
            "-o", "compute_dtype=float32", "-o", "pretrained_init=false",
            "-o", "proj_dim=16"]
    rc = main(["extract", "ssp-single", "--out", out, "--batch-size", "16",
               *tiny])
    assert rc == 0
    data = np.load(out)
    ds_n = 2048  # synthetic train split size
    assert data["features"].shape == (ds_n, 16)
    assert data["labels"].shape == (ds_n,)
    assert np.isfinite(data["features"]).all()
    # deterministic eval views: a second run reproduces exactly
    out2 = str(tmp_path / "feats2.npz")
    assert main(["extract", "ssp-single", "--out", out2, "--batch-size", "16",
                 *tiny]) == 0
    np.testing.assert_array_equal(data["features"], np.load(out2)["features"])


def test_convert_rejects_mismatched_pytree(tmp_path):
    """A key-mismatched pytree source (e.g. a full training checkpoint, or a
    different geometry) must ERROR, not silently export the random template
    as a 'converted' .pth."""
    import jax

    from vit2spn_tpu.core.config import ViTConfig
    from vit2spn_tpu.models.vit import init_vit
    from vit2spn_tpu.train import checkpoint as ckpt

    cfg = ViTConfig(image_size=32, patch_size=16, hidden_size=24,
                    num_layers=2, num_heads=2, mlp_dim=48)
    params = init_vit(jax.random.key(5), cfg)
    # wrap like a training checkpoint: keys prefixed, no backbone match
    src = str(tmp_path / "ckpt.npz")
    ckpt.save(src, {"params": {"online": jax.device_get(params)}}, {})
    ov = [f"vit.{k}={getattr(cfg, k)}" for k in
          ("image_size", "patch_size", "hidden_size", "num_layers",
           "num_heads", "mlp_dim")]
    with pytest.raises(KeyError):
        main(["convert", src, str(tmp_path / "o.pth"),
              *sum((["-o", o] for o in ov), [])])


def test_resolve_backbone_strict_on_explicit_init_path(tmp_path):
    """An explicit init_path .npz whose keys don't match the configured
    backbone must raise (reference fine-tune ingest is a strict
    load_state_dict, octmnist_ft_vit2spn.py:190), not silently fine-tune a
    random init."""
    import jax

    from vit2spn_tpu.cli import _resolve_backbone
    from vit2spn_tpu.core.config import ViTConfig
    from vit2spn_tpu.models.vit import init_vit
    from vit2spn_tpu.train import checkpoint as ckpt
    from vit2spn_tpu.utils.logging import MetricLogger

    good_cfg = ViTConfig(image_size=32, patch_size=16, hidden_size=24,
                         num_layers=2, num_heads=2, mlp_dim=48)
    path = str(tmp_path / "export.npz")
    ckpt.save(path, jax.device_get(init_vit(jax.random.key(0), good_cfg)), {})

    ft = FineTuneConfig(vit=good_cfg, init="ssp", init_path=path)
    logger = MetricLogger(echo=False)
    out = _resolve_backbone(ft, logger)  # matching geometry: loads fine
    assert out is not None

    # wrong geometry (same tree, different shapes): loud reshape error
    wrong_geom = FineTuneConfig(
        vit=ViTConfig(image_size=32, patch_size=16, hidden_size=32,
                      num_layers=2, num_heads=2, mlp_dim=64),
        init="ssp", init_path=path,
    )
    with pytest.raises((KeyError, ValueError)):
        _resolve_backbone(wrong_geom, logger)

    # wrong FILE (a full training checkpoint, keys prefixed): strict
    # KeyError instead of silently fine-tuning the random template
    wrapped = str(tmp_path / "training_ckpt.npz")
    ckpt.save(
        wrapped,
        {"params": {"online": jax.device_get(init_vit(jax.random.key(1),
                                                      good_cfg))}},
        {},
    )
    with pytest.raises(KeyError):
        _resolve_backbone(
            FineTuneConfig(vit=good_cfg, init="ssp", init_path=wrapped),
            logger,
        )


def test_cli_inspect(tmp_path, capsys):
    """`vit2spn inspect` lists keys/shapes/dtypes + metadata for .npz
    exports and torch state dicts — the diagnostic companion to the strict
    interop loads."""
    import jax

    from vit2spn_tpu.core.config import ViTConfig
    from vit2spn_tpu.models.vit import init_vit
    from vit2spn_tpu.train import checkpoint as ckpt

    cfg = ViTConfig(image_size=32, patch_size=16, hidden_size=24,
                    num_layers=1, num_heads=2, mlp_dim=48)
    path = str(tmp_path / "export.npz")
    ckpt.save(path, jax.device_get(init_vit(jax.random.key(0), cfg)),
              {"format": "vit_backbone", "epoch": 3})
    assert main(["inspect", path]) == 0
    out = capsys.readouterr().out
    assert "patch_embed/kernel" in out
    assert "float32" in out

    torch = pytest.importorskip("torch")
    pth = str(tmp_path / "sd.pth")
    torch.save({"vit.embeddings.cls_token": torch.zeros(1, 1, 24)}, pth)
    assert main(["inspect", pth]) == 0
    out = capsys.readouterr().out
    # load_local_state normalizes the reference's `vit.` export prefix away
    assert "embeddings.cls_token  (1, 1, 24)" in out

    assert main(["inspect", str(tmp_path / "x.bin")]) == 2


def test_cli_run_ft_artifacts_and_standalone_plots(tmp_path):
    """`run ft-*` writes the reference's artifact set — ROC-all-folds PNG +
    confusion-matrix PNG under the reference's per-script names
    (octmnist_ft_vit2spn.py:166,226), the PRINTED classification report
    persisted as text (:168), and a cv_result.json that the standalone
    `vit2spn plot roc|cm` commands re-render without re-running the
    protocol."""
    out = tmp_path / "ft"
    rc = main([
        "run", "ft-octmnist", "--epochs", "1", "--output-dir", str(out),
        "-o", "data.name=synthetic", "-o", "k_folds=2",
        "-o", "data.subset_fraction=0.02", "-o", "data.test_subset_size=24",
        "-o", "batch_size=8", "-o", "init=random", "-o", "compute_dtype=float32",
        "-o", "vit.image_size=32", "-o", "vit.hidden_size=32",
        "-o", "vit.num_layers=2", "-o", "vit.num_heads=2",
        "-o", "vit.mlp_dim=64", "-o", "data.augment.out_size=32",
    ])
    assert rc == 0
    assert (out / "synthetic_roc_curve_all_folds.png").exists()
    assert (out / "synthetic_confusion_matrix.png").exists()
    report = (out / "synthetic_classification_report.txt").read_text()
    # sklearn classification_report layout (byte parity tested in
    # test_metrics.py); here: the artifact exists and has the right shape
    assert "precision    recall  f1-score   support" in report
    assert "weighted avg" in report

    result = out / "synthetic_cv_result.json"
    assert result.exists()
    roc_png = tmp_path / "roc_again.png"
    rc = main(["plot", "roc", "--result", str(result), "--out", str(roc_png)])
    assert rc == 0 and roc_png.exists()
    cm_png = tmp_path / "cm_again.png"
    rc = main(["plot", "cm", "--result", str(result), "--out", str(cm_png)])
    assert rc == 0 and cm_png.exists()
    # roc/cm without --result is a usage error, not a crash
    assert main(["plot", "roc", "--out", str(tmp_path / "x.png")]) == 2


def test_cv_result_json_size_bounded(tmp_path):
    """Real-data runs emit one ROC threshold per distinct score — thousands
    of points × 10 folds × classes reached tens of MB. _save_cv_result
    decimates each curve to ≤512 endpoint-preserving points; the re-rendered
    figure (the actual contract, octmnist_ft_vit2spn.py:217-227) is visually
    exact at its 1000-px render width."""
    import json

    import numpy as np

    from vit2spn_tpu.cli import _ROC_MAX_POINTS, _decimate_curve, _save_cv_result

    # decimation: short curves bit-exact, long curves bounded + ends kept
    short = np.linspace(0, 1, 40)
    assert _decimate_curve(short) == short.tolist()
    long = np.sort(np.random.RandomState(0).rand(20_000))
    dec = _decimate_curve(long)
    assert len(dec) <= _ROC_MAX_POINTS
    assert dec[0] == long[0] and dec[-1] == long[-1]
    assert dec == sorted(dec)  # monotone stays monotone

    # whole-file bound at real-data scale: 10 folds × 4 classes × 20k points
    class _Res:
        pass

    res = _Res()
    res.fold_aucs = [0.9] * 10
    res.best_fold = 0
    res.test_summary = {
        "per_class": {f"c{i}": {} for i in range(4)},
        "confusion_matrix": np.eye(4, dtype=int),
    }
    n = 20_000
    curve = np.linspace(0.0, 1.0, n)
    res.fold_rocs = {
        f: ({c: curve for c in range(4)}, {c: curve for c in range(4)},
            {c: 0.9 for c in range(4)})
        for f in range(10)
    }

    class _Cfg:
        class data:
            name = "sized"

    path = _save_cv_result(res, _Cfg, str(tmp_path))
    size = (tmp_path / "sized_cv_result.json").stat().st_size
    assert size < 2_000_000, f"cv_result.json ballooned to {size} bytes"
    with open(path) as f:
        payload = json.load(f)
    pts = payload["fold_rocs"]["0"]["fpr"]["0"]
    assert len(pts) <= _ROC_MAX_POINTS and pts[0] == 0.0 and pts[-1] == 1.0
