import os

import numpy as np
import pytest

pytest.importorskip("matplotlib")

from vit2spn_tpu.evals.metrics import per_class_roc
from vit2spn_tpu.evals.plots import (
    PT_SCRATCH_RESULTS,
    SSP_SP_RESULTS,
    confusion_matrix_plot,
    loss_curve,
    radar_chart,
    roc_all_folds,
)


def _fake_fold_rocs(k=3, n=50, c=4, seed=0):
    rng = np.random.default_rng(seed)
    rocs, aucs = {}, []
    for f in range(k):
        labels = rng.integers(0, c, n)
        probs = rng.dirichlet(np.ones(c), n)
        rocs[f] = per_class_roc(labels, probs)
        aucs.append(float(np.mean(list(rocs[f][2].values()))))
    return rocs, aucs


def test_roc_all_folds(tmp_path):
    rocs, aucs = _fake_fold_rocs()
    p = roc_all_folds(rocs, aucs, str(tmp_path / "roc.png"))
    assert os.path.getsize(p) > 1000


def test_confusion_matrix_plot(tmp_path):
    cm = np.array([[5, 1], [2, 7]])
    p = confusion_matrix_plot(cm, ["a", "b"], str(tmp_path / "cm.png"))
    assert os.path.getsize(p) > 1000


def test_loss_curve(tmp_path):
    p = loss_curve([0.5, 0.2, -0.1, -0.4], str(tmp_path / "loss.png"))
    assert os.path.getsize(p) > 1000


def test_radar_charts_published_tables(tmp_path):
    for name, table in (("pt", PT_SCRATCH_RESULTS), ("sp", SSP_SP_RESULTS)):
        assert len(table) == 3  # three dataset panels
        p = radar_chart(table, str(tmp_path / f"{name}.pdf"))
        assert os.path.getsize(p) > 1000
