"""The real-data parity runbook's plumbing and provenance gating.

The published chain (README.md:10,46) needs datasets/weights this
environment lacks; `vit2spn parity --smoke` must still exercise every stage
— SSP pretrain → backbone export → strict ingest → the three fine-tune CV
protocols → multitrial → comparison artifact — so that the day real data
appears, parity is one command with zero untested plumbing.

Provenance gating matrix (real-format tiny stand-ins under tmp dirs,
shrink_geometry mode so the REAL loaders run at smoke cost):
  * folders-only (no octmnist.npz): NO stage runs — stage 1 pretrains on
    octmnist (ssp_vit2spn_tiny.py:101-107) and a synthetic backbone must
    never feed the fine-tunes; status names octmnist.
  * octmnist-only: the chain runs on what is real, but the verdict is
    INPUTS-INCOMPLETE naming every missing input and recording the
    random-init deviation (ssp_vit2spn_tiny.py:112) — never PASS/FAIL.
  * all datasets, no weights: measured everywhere, still INPUTS-INCOMPLETE
    naming exactly vit_tiny_weights.
The PASS/FAIL metric gating (mAUC AND accuracy per dataset, README.md:10;
multitrial specificity floor, README.md:46) is unit-tested through
compute_status directly.
"""

import json
import os

import numpy as np
import pytest

from vit2spn_tpu.evals.parity import (
    PUBLISHED,
    check_inputs,
    compute_status,
    run_parity,
    smoke_vit_config,
)
from vit2spn_tpu.utils.logging import MetricLogger


def _logger():
    return MetricLogger(echo=False)


def _write_octmnist(root, n=dict(train=640, val=32, test=64)):
    """medmnist-layout octmnist.npz stand-in (octmnist_dataset.py:12-17):
    {split}_images uint8 (N, 28, 28), {split}_labels (N, 1)."""
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(0)
    arrs = {}
    for split, count in n.items():
        arrs[f"{split}_images"] = rng.integers(
            0, 256, size=(count, 28, 28), dtype=np.uint8
        )
        labs = np.arange(count) % 4  # every class well represented
        rng.shuffle(labs)
        arrs[f"{split}_labels"] = labs.reshape(-1, 1).astype(np.int64)
    np.savez(os.path.join(root, "octmnist.npz"), **arrs)


def _write_folder(root, sub, classes, n_per):
    """ImageFolder-layout stand-in: root/<sub>/<class>/<i>.jpg."""
    from PIL import Image

    rng = np.random.default_rng(1)
    for cls in classes:
        d = os.path.join(root, sub, cls)
        os.makedirs(d, exist_ok=True)
        for i in range(n_per):
            img = rng.integers(0, 256, size=(40, 40), dtype=np.uint8)
            Image.fromarray(img, "L").save(os.path.join(d, f"{i}.jpg"))


def _write_smoke_weights(path):
    """An HF-keyed .npz at the smoke geometry — the ViT-Tiny weight
    stand-in $VIT2SPN_VIT_TINY_PATH ingests (hf_convert.load_local_state)."""
    import jax

    from vit2spn_tpu.models.hf_convert import convert_to_hf_state_dict
    from vit2spn_tpu.models.vit import init_vit

    cfg = smoke_vit_config()
    state = convert_to_hf_state_dict(init_vit(jax.random.key(7), cfg), cfg)
    np.savez(path, **state)


def test_check_inputs_reports_missing(tmp_path, monkeypatch):
    monkeypatch.delenv("VIT2SPN_VIT_TINY_PATH", raising=False)
    avail = check_inputs(str(tmp_path))  # empty dir: nothing real
    assert avail == {
        "octmnist": False,
        "octid": False,
        "ucsdoct": False,
        "vit_tiny_weights": False,
    }


def test_parity_smoke_end_to_end(tmp_path, monkeypatch):
    monkeypatch.delenv("VIT2SPN_VIT_TINY_PATH", raising=False)
    out = str(tmp_path / "parity")
    report = run_parity(
        data_root=str(tmp_path / "nodata"),
        out_dir=out,
        logger=_logger(),
        smoke=True,
    )
    # every stage ran and is in the report
    assert report["smoke"] is True
    assert "SMOKE" in report["status"]
    assert set(report["datasets"]) == set(PUBLISHED)
    for name, entry in report["datasets"].items():
        assert entry["published_mauc"] == PUBLISHED[name]["mauc"]
        assert 0.0 <= entry["measured_mauc"] <= 1.0
        assert "within_tol" in entry
        assert "mauc_within" in entry and "accuracy_within" in entry
    assert report["ssp"]["epochs_run"] == 2
    assert report["ssp"]["init_provenance"] == "random"  # no weights reachable
    assert 0.0 <= report["ssp"]["pred_std"]
    assert "specificity_mean" in report["multitrial"]
    assert "floor_within_tol" in report["multitrial"]
    # artifacts: JSON report, markdown table, the SSP export it ingested
    assert os.path.exists(os.path.join(out, "parity_report.json"))
    assert os.path.exists(os.path.join(out, "ssp_backbone_export.npz"))
    md = open(os.path.join(out, "parity_report.md")).read()
    assert "published mAUC" in md and "octmnist" in md
    assert "mAUC ok" in md and "acc ok" in md  # per-metric verdict columns
    with open(os.path.join(out, "parity_report.json")) as f:
        assert json.load(f)["status"] == report["status"]
    # multitrial resume state was persisted (killed runs resume)
    assert os.path.exists(os.path.join(out, "multitrial_state.json"))


def test_parity_smoke_covers_pretrained_ingest(tmp_path, monkeypatch):
    """The smoke must exercise stage 1's pretrained-ingest branch — the path
    the real run takes (_try_pretrained_backbone, ssp_vit2spn_tiny.py:112) —
    through the runbook's own wiring."""
    wpath = str(tmp_path / "vit_tiny_smoke.npz")
    _write_smoke_weights(wpath)
    monkeypatch.setenv("VIT2SPN_VIT_TINY_PATH", wpath)
    report = run_parity(
        data_root=str(tmp_path / "nodata"),
        out_dir=str(tmp_path / "parity"),
        logger=_logger(),
        smoke=True,
        epochs=1,
        ft_epochs=1,
        skip_multitrial=True,
    )
    assert report["inputs"]["vit_tiny_weights"] is True
    assert report["ssp"]["init_provenance"] == "pretrained"
    assert "SMOKE" in report["status"]


def test_parity_gates_missing_octmnist(tmp_path, monkeypatch):
    """Real folder datasets but no octmnist.npz: the SSP corpus would be
    synthetic, so NOTHING runs — no fine-tune may sit downstream of a
    synthetic backbone — and the status names the missing input."""
    monkeypatch.delenv("VIT2SPN_VIT_TINY_PATH", raising=False)
    root = str(tmp_path / "data")
    _write_folder(root, "octird", ["amd", "csr", "dr", "mh", "normal"], 3)
    _write_folder(root, "ucsdoct", ["CNV", "DME", "DRUSEN", "NORMAL"], 3)
    report = run_parity(
        data_root=root,
        out_dir=str(tmp_path / "out"),
        logger=_logger(),
        shrink_geometry=True,
    )
    assert report["status"].startswith("INPUTS-INCOMPLETE")
    assert "octmnist" in report["status"]
    assert "no stage ran" in report["status"]
    assert "ssp" not in report and report["datasets"] == {}
    # the availability probe saw the real folders
    assert report["inputs"]["octid"] and report["inputs"]["ucsdoct"]


def test_parity_octmnist_only_withholds_verdict(tmp_path, monkeypatch):
    """octmnist.npz alone: the chain runs on what is real (random-init
    deviation recorded), but the verdict names every missing input and is
    never PASS/FAIL."""
    monkeypatch.delenv("VIT2SPN_VIT_TINY_PATH", raising=False)
    root = str(tmp_path / "data")
    _write_octmnist(root)
    report = run_parity(
        data_root=root,
        out_dir=str(tmp_path / "out"),
        logger=_logger(),
        shrink_geometry=True,
        epochs=1,
        ft_epochs=1,
        skip_multitrial=True,
    )
    s = report["status"]
    assert s.startswith("INPUTS-INCOMPLETE")
    for missing in ("octid", "ucsdoct", "vit_tiny_weights"):
        assert missing in s
    assert not s.startswith(("PASS", "FAIL"))
    assert report["init_deviation"] == "random"
    # the trainer ATTEMPTED the pretrained init (preset default) and fell
    # back — the gate reflects what actually happened
    assert report["ssp"]["init_provenance"] == "random_fallback"
    assert set(report["datasets"]) == {"octmnist"}
    e = report["datasets"]["octmnist"]
    assert {"mauc_within", "accuracy_within", "within_tol"} <= set(e)
    md = open(os.path.join(str(tmp_path / "out"), "parity_report.md")).read()
    assert "Init deviation" in md and "INPUTS-INCOMPLETE" in md


def test_parity_all_data_no_weights(tmp_path, monkeypatch):
    """Every dataset real but no ViT-Tiny weights: all stages measured,
    status INPUTS-INCOMPLETE naming exactly the weights."""
    monkeypatch.delenv("VIT2SPN_VIT_TINY_PATH", raising=False)
    root = str(tmp_path / "data")
    _write_octmnist(root)
    _write_folder(root, "octird", ["amd", "csr", "dr", "mh", "normal"], 10)
    _write_folder(root, "ucsdoct", ["CNV", "DME", "DRUSEN", "NORMAL"], 12)
    report = run_parity(
        data_root=root,
        out_dir=str(tmp_path / "out"),
        logger=_logger(),
        shrink_geometry=True,
        epochs=1,
        ft_epochs=1,
        skip_multitrial=True,
    )
    assert report["status"].startswith(
        "INPUTS-INCOMPLETE: missing vit_tiny_weights"
    )
    assert set(report["datasets"]) == set(PUBLISHED)
    assert report["init_deviation"] == "random"


def test_parity_resume_gates_checkpoint_lineage(tmp_path, monkeypatch):
    """A random-lineage ssp_checkpoint.npz resumed under a later run WITH
    weights available must not be judged PASS/FAIL: the resumed state never
    saw the pretrained init, fit() adopts the checkpoint's recorded
    provenance, and the post-fit gate downgrades the input."""
    import dataclasses

    import jax

    from vit2spn_tpu.core.presets import get_preset
    from vit2spn_tpu.evals.parity import _shrink_overrides
    from vit2spn_tpu.train import checkpoint as ckpt
    from vit2spn_tpu.train.ssp import SSPTrainer

    root = str(tmp_path / "data")
    _write_octmnist(root)
    _write_folder(root, "octird", ["amd", "csr", "dr", "mh", "normal"], 10)
    _write_folder(root, "ucsdoct", ["CNV", "DME", "DRUSEN", "NORMAL"], 12)
    wpath = str(tmp_path / "vit_tiny_smoke.npz")
    _write_smoke_weights(wpath)
    monkeypatch.setenv("VIT2SPN_VIT_TINY_PATH", wpath)

    out = str(tmp_path / "out")
    os.makedirs(out, exist_ok=True)
    # pre-seed the RANDOM-lineage checkpoint a previous no-weights run would
    # have left behind, at the exact state geometry the shrunk run constructs
    ssp_cfg = get_preset("ssp")
    ssp_cfg = dataclasses.replace(
        ssp_cfg,
        data=dataclasses.replace(ssp_cfg.data, root=root),
        pretrained_init=False,
    )
    ssp_cfg = _shrink_overrides(ssp_cfg)
    seed_tr = SSPTrainer(ssp_cfg, logger=_logger())
    ckpt.save(
        os.path.join(out, "ssp_checkpoint.npz"),
        jax.device_get(seed_tr.state),
        {"epoch": 1, "loss": -0.25, "init_provenance": "random",
         "dataset_name": "octmnist/train", "dataset_synthetic": False},
    )

    report = run_parity(
        data_root=root, out_dir=out, logger=_logger(),
        shrink_geometry=True, epochs=1, ft_epochs=1, skip_multitrial=True,
    )
    # the upfront probe saw the weights, but the resumed state never used them
    assert report["ssp"]["init_provenance"] == "random"
    assert report["inputs"]["vit_tiny_weights"] is False
    s = report["status"]
    assert s.startswith("INPUTS-INCOMPLETE") and "vit_tiny_weights" in s
    assert report["init_deviation"] == "random"
    # resume-aware accounting: resumed at the single requested epoch, so no
    # new epochs ran and the final loss is the checkpoint's
    assert report["ssp"]["epochs_run"] == 1
    assert report["ssp"]["final_loss"] == pytest.approx(-0.25)
    # the markdown report renders through the resumed-empty-history path
    md = open(os.path.join(out, "parity_report.md")).read()
    assert "INPUTS-INCOMPLETE" in md


def test_parity_resume_keeps_pretrained_lineage(tmp_path, monkeypatch):
    """The converse gate direction: a GENUINE pretrained-lineage checkpoint
    resumed after the weight file disappeared still gets a PASS/FAIL-class
    verdict — the run consumed the published init; the gate reflects what
    actually happened, in both directions."""
    import dataclasses

    import jax

    from vit2spn_tpu.core.presets import get_preset
    from vit2spn_tpu.evals.parity import _shrink_overrides
    from vit2spn_tpu.train import checkpoint as ckpt
    from vit2spn_tpu.train.ssp import SSPTrainer

    monkeypatch.delenv("VIT2SPN_VIT_TINY_PATH", raising=False)
    root = str(tmp_path / "data")
    _write_octmnist(root)
    _write_folder(root, "octird", ["amd", "csr", "dr", "mh", "normal"], 10)
    _write_folder(root, "ucsdoct", ["CNV", "DME", "DRUSEN", "NORMAL"], 12)

    out = str(tmp_path / "out")
    os.makedirs(out, exist_ok=True)
    ssp_cfg = get_preset("ssp")
    ssp_cfg = dataclasses.replace(
        ssp_cfg,
        data=dataclasses.replace(ssp_cfg.data, root=root),
        pretrained_init=False,
    )
    ssp_cfg = _shrink_overrides(ssp_cfg)
    seed_tr = SSPTrainer(ssp_cfg, logger=_logger())
    ckpt.save(
        os.path.join(out, "ssp_checkpoint.npz"),
        jax.device_get(seed_tr.state),
        {"epoch": 1, "loss": -0.5, "init_provenance": "pretrained",
         "dataset_name": "octmnist/train", "dataset_synthetic": False},
    )

    report = run_parity(
        data_root=root, out_dir=out, logger=_logger(),
        shrink_geometry=True, epochs=1, ft_epochs=1, skip_multitrial=True,
    )
    assert report["ssp"]["init_provenance"] == "pretrained"
    assert report["inputs"]["vit_tiny_weights"] is True  # upgraded post-fit
    assert report["status"].startswith(("PASS", "FAIL"))
    assert "init_deviation" not in report


def test_parity_degrades_when_probe_passes_but_load_fails(tmp_path,
                                                          monkeypatch):
    """The structural probe decodes only a sample; a corrupt image deeper in
    a folder dataset must degrade the verdict to INPUTS-INCOMPLETE (with the
    error recorded and the report still written) — not crash away the
    completed stages."""
    monkeypatch.delenv("VIT2SPN_VIT_TINY_PATH", raising=False)
    root = str(tmp_path / "data")
    _write_octmnist(root)
    _write_folder(root, "octird", ["amd", "csr", "dr", "mh", "normal"], 10)
    _write_folder(root, "ucsdoct", ["CNV", "DME", "DRUSEN", "NORMAL"], 12)
    # corrupt JPEG that sorts LAST so the probe's first-image decode passes
    with open(os.path.join(root, "ucsdoct", "NORMAL", "zzz.jpg"), "wb") as f:
        f.write(b"not a jpeg at all")

    report = run_parity(
        data_root=root, out_dir=str(tmp_path / "out"), logger=_logger(),
        shrink_geometry=True, epochs=1, ft_epochs=1, skip_multitrial=True,
    )
    s = report["status"]
    assert s.startswith("INPUTS-INCOMPLETE") and "ucsdoct" in s
    assert "ucsdoct" in report.get("load_errors", {})
    # the healthy datasets were still measured, the broken one skipped
    assert "octmnist" in report["datasets"] and "octid" in report["datasets"]
    assert "ucsdoct" not in report["datasets"]
    assert os.path.exists(str(tmp_path / "out" / "parity_report.md"))


def test_parity_refuses_foreign_checkpoint(tmp_path, monkeypatch):
    """A checkpoint from a DIFFERENT run in the same --out must be refused
    with a written report — resuming it would either crash deep in restore
    (wrong geometry) or silently count foreign epochs into the verdict
    (same geometry, different data — e.g. a --smoke run's synthetic-trained
    state)."""
    import dataclasses

    import jax

    from vit2spn_tpu.core.config import ViTConfig
    from vit2spn_tpu.core.presets import get_preset
    from vit2spn_tpu.evals.parity import _shrink_overrides
    from vit2spn_tpu.train import checkpoint as ckpt
    from vit2spn_tpu.train.ssp import SSPTrainer

    monkeypatch.delenv("VIT2SPN_VIT_TINY_PATH", raising=False)
    root = str(tmp_path / "data")
    _write_octmnist(root)

    def _seed(out, state, meta):
        os.makedirs(out, exist_ok=True)
        ckpt.save(os.path.join(out, "ssp_checkpoint.npz"),
                  jax.device_get(state), meta)

    ssp_cfg = get_preset("ssp")
    ssp_cfg = dataclasses.replace(
        ssp_cfg,
        data=dataclasses.replace(ssp_cfg.data, root=root),
        pretrained_init=False,
    )
    shrunk = _shrink_overrides(ssp_cfg)

    # (a) same geometry, synthetic-trained (a --smoke run's leftover; smoke
    # swaps data.name to "synthetic", so the name itself differs)
    out_a = str(tmp_path / "out_a")
    _seed(out_a, SSPTrainer(shrunk, logger=_logger()).state,
          {"epoch": 1, "loss": -0.5, "init_provenance": "pretrained",
           "dataset_name": "synthetic/train", "dataset_synthetic": True})
    rep = run_parity(data_root=root, out_dir=out_a, logger=_logger(),
                     shrink_geometry=True, epochs=1, ft_epochs=1,
                     skip_multitrial=True)
    assert rep["status"].startswith("ERROR") and "synthetic" in rep["status"]
    assert "ssp" not in rep  # nothing ran
    assert os.path.exists(os.path.join(out_a, "parity_report.md"))

    # (b) right data, wrong geometry (e.g. a full-geometry run's leftover)
    other = dataclasses.replace(
        shrunk, vit=ViTConfig(image_size=32, patch_size=16, hidden_size=16,
                              num_layers=2, num_heads=2, mlp_dim=32),
    )
    out_b = str(tmp_path / "out_b")
    _seed(out_b, SSPTrainer(other, logger=_logger()).state,
          {"epoch": 1, "loss": -0.5, "init_provenance": "pretrained",
           "dataset_name": "octmnist"})
    rep = run_parity(data_root=root, out_dir=out_b, logger=_logger(),
                     shrink_geometry=True, epochs=1, ft_epochs=1,
                     skip_multitrial=True)
    assert rep["status"].startswith("ERROR") and "incompatible" in rep["status"]

    # (c) pre-lineage-field checkpoint: lineage unknowable -> refused too
    out_c = str(tmp_path / "out_c")
    _seed(out_c, SSPTrainer(shrunk, logger=_logger()).state,
          {"epoch": 1, "loss": -0.5})
    rep = run_parity(data_root=root, out_dir=out_c, logger=_logger(),
                     shrink_geometry=True, epochs=1, ft_epochs=1,
                     skip_multitrial=True)
    assert rep["status"].startswith("ERROR")

    # (d) the name-collision hole: the loaders' synthetic FALLBACK reuses
    # the real dataset's name — a `vit2spn run ssp` checkpoint trained on
    # the "octmnist"-named stand-in (with real ViT-Tiny weights, so
    # pretrained provenance) must still be refused; only the explicit
    # dataset_synthetic flag can tell it apart
    out_d = str(tmp_path / "out_d")
    _seed(out_d, SSPTrainer(shrunk, logger=_logger()).state,
          {"epoch": 1, "loss": -0.5, "init_provenance": "pretrained",
           "dataset_name": "octmnist/train", "dataset_synthetic": True})
    rep = run_parity(data_root=root, out_dir=out_d, logger=_logger(),
                     shrink_geometry=True, epochs=1, ft_epochs=1,
                     skip_multitrial=True)
    assert rep["status"].startswith("ERROR") and "synthetic" in rep["status"]
    assert "ssp" not in rep


def test_parity_resumes_its_own_checkpoint(tmp_path, monkeypatch):
    """The lineage gate must ACCEPT the runbook's own checkpoint: an
    interrupted run re-invoked with the same --out resumes instead of
    erroring. Regression: the gate once compared the corpus name
    ("octmnist") against the split name fit() actually records
    ("octmnist/train") and refused every legitimate resume."""
    monkeypatch.delenv("VIT2SPN_VIT_TINY_PATH", raising=False)
    root = str(tmp_path / "data")
    _write_octmnist(root)
    _write_folder(root, "octird", ["amd", "csr", "dr", "mh", "normal"], 10)
    _write_folder(root, "ucsdoct", ["CNV", "DME", "DRUSEN", "NORMAL"], 12)
    out = str(tmp_path / "out")

    # epochs=10 = one checkpoint cadence (fit saves every 10th epoch,
    # ssp_vit2spn_tiny.py:198) so the run actually leaves a checkpoint
    first = run_parity(data_root=root, out_dir=out, logger=_logger(),
                       shrink_geometry=True, epochs=10, ft_epochs=1,
                       skip_multitrial=True)
    assert not first["status"].startswith("ERROR")
    assert os.path.exists(os.path.join(out, "ssp_checkpoint.npz"))

    # second invocation finds the first run's checkpoint: the gate must
    # let fit() resume it (here: already at the target epoch, 0 new epochs)
    second = run_parity(data_root=root, out_dir=out, logger=_logger(),
                        shrink_geometry=True, epochs=10, ft_epochs=1,
                        skip_multitrial=True)
    assert not second["status"].startswith("ERROR")
    assert second["ssp"]["epochs_run"] == 10
    assert second["ssp"]["final_loss"] == pytest.approx(
        first["ssp"]["final_loss"])


def test_probe_dataset_structural(tmp_path):
    """check_inputs' availability probe must not pay the full decode, but
    still reject missing/corrupt/empty inputs."""
    from vit2spn_tpu.data.datasets import probe_dataset

    root = str(tmp_path)
    assert probe_dataset("octmnist", root) is False
    assert probe_dataset("octid", root) is False
    assert probe_dataset("ucsdoct", root) is False
    _write_octmnist(root)
    _write_folder(root, "octird", ["amd", "csr"], 1)
    assert probe_dataset("octmnist", root) is True
    assert probe_dataset("octid", root) is True
    assert probe_dataset("ucsdoct", root) is False
    # empty class dirs are not available
    os.makedirs(os.path.join(root, "ucsdoct", "CNV"))
    assert probe_dataset("ucsdoct", root) is False
    # a truncated npz (no zip directory) is unavailable, not an exception
    p = os.path.join(root, "octmnist.npz")
    blob = open(p, "rb").read()
    with open(p, "wb") as f:
        f.write(blob[: len(blob) // 2])
    assert probe_dataset("octmnist", root) is False


# ---------------------------------------------------------------------------
# compute_status: the pure verdict over an assembled report
# ---------------------------------------------------------------------------

def _entry(mauc_ok=True, acc_ok=True):
    return {"mauc_within": mauc_ok, "accuracy_within": acc_ok,
            "within_tol": mauc_ok and acc_ok}


def _report(**overrides):
    base = {
        "smoke": False,
        "inputs": {"octmnist": True, "octid": True, "ucsdoct": True,
                   "vit_tiny_weights": True},
        "ssp": {"collapse_flag": False},
        "datasets": {k: _entry() for k in PUBLISHED},
    }
    base.update(overrides)
    return base


def test_status_pass_requires_every_input_and_metric():
    assert compute_status(_report()) == "PASS"


def test_status_fail_names_the_failing_metric():
    r = _report()
    r["datasets"]["octmnist"] = _entry(mauc_ok=True, acc_ok=False)
    s = compute_status(r)
    assert s.startswith("FAIL") and "octmnist accuracy" in s
    assert "octmnist mAUC" not in s
    r["datasets"]["ucsdoct"] = _entry(mauc_ok=False)
    assert "ucsdoct mAUC" in compute_status(r)


def test_status_gates_collapse_and_specificity_floor():
    r = _report(ssp={"collapse_flag": True})
    assert "ssp pred_std collapse" in compute_status(r)
    r = _report(multitrial={"floor_within_tol": False})
    s = compute_status(r)
    assert s.startswith("FAIL") and "multitrial specificity" in s
    r = _report(multitrial={"floor_within_tol": True})
    assert compute_status(r) == "PASS"


def test_status_missing_input_never_passes_or_fails():
    r = _report()
    r["inputs"]["vit_tiny_weights"] = False
    s = compute_status(r)
    assert s.startswith("INPUTS-INCOMPLETE") and "vit_tiny_weights" in s
    assert not s.startswith(("PASS", "FAIL"))
    # even with a failing metric the status stays INPUTS-INCOMPLETE
    r["datasets"]["octid"] = _entry(acc_ok=False)
    assert compute_status(r).startswith("INPUTS-INCOMPLETE")


def test_status_shrunk_geometry_is_labelled():
    r = _report(shrunk_geometry=True)
    assert compute_status(r) == "PASS (shrunk geometry — NOT parity evidence)"
