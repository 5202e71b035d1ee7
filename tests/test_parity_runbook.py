"""The real-data parity runbook's plumbing, end-to-end on synthetic data.

The published chain (README.md:10,46) needs datasets/weights this
environment lacks; `vit2spn parity --smoke` must still exercise every stage
— SSP pretrain → backbone export → strict ingest → the three fine-tune CV
protocols → multitrial → comparison artifact — so that the day real data
appears, parity is one command with zero untested plumbing.
"""

import json
import os

from vit2spn_tpu.evals.parity import PUBLISHED, check_inputs, run_parity
from vit2spn_tpu.utils.logging import MetricLogger


def test_check_inputs_reports_missing(tmp_path):
    avail = check_inputs(str(tmp_path))  # empty dir: nothing real
    assert avail == {
        "octmnist": False,
        "octid": False,
        "ucsdoct": False,
        "vit_tiny_weights": False,
    }


def test_parity_smoke_end_to_end(tmp_path):
    out = str(tmp_path / "parity")
    report = run_parity(
        data_root=str(tmp_path / "nodata"),
        out_dir=out,
        logger=MetricLogger(echo=False),
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
    assert report["ssp"]["epochs_run"] == 2
    assert 0.0 <= report["ssp"]["pred_std"]
    assert "specificity_mean" in report["multitrial"]
    # artifacts: JSON report, markdown table, the SSP export it ingested
    assert os.path.exists(os.path.join(out, "parity_report.json"))
    assert os.path.exists(os.path.join(out, "ssp_backbone_export.npz"))
    md = open(os.path.join(out, "parity_report.md")).read()
    assert "published mAUC" in md and "octmnist" in md
    with open(os.path.join(out, "parity_report.json")) as f:
        assert json.load(f)["status"] == report["status"]
    # multitrial resume state was persisted (killed runs resume)
    assert os.path.exists(os.path.join(out, "multitrial_state.json"))
