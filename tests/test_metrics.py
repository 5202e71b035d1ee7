import warnings

import numpy as np
import pytest

from vit2spn_tpu.evals.kfold import stratified_holdout, stratified_kfold
from vit2spn_tpu.evals.metrics import (
    auc,
    classification_summary,
    confusion_matrix,
    mean_auc,
    per_class_roc,
    roc_curve,
    sensitivity_specificity,
)


@pytest.fixture(scope="module")
def fake_preds():
    rng = np.random.default_rng(0)
    labels = rng.integers(0, 4, 200)
    logits = rng.normal(size=(200, 4)) + 2.0 * np.eye(4)[labels]
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    return labels, probs


def test_roc_auc_matches_sklearn(fake_preds):
    skm = pytest.importorskip("sklearn.metrics")
    labels, probs = fake_preds
    for i in range(4):
        y = (labels == i).astype(int)
        ours_fpr, ours_tpr, _ = roc_curve(y, probs[:, i])
        ours = auc(ours_fpr, ours_tpr)
        ref = skm.roc_auc_score(y, probs[:, i])
        assert ours == pytest.approx(ref, abs=1e-9)


def test_mean_auc_matches_sklearn_ovr(fake_preds):
    skm = pytest.importorskip("sklearn.metrics")
    labels, probs = fake_preds
    ref = skm.roc_auc_score(labels, probs, multi_class="ovr", average="macro")
    assert mean_auc(labels, probs) == pytest.approx(ref, abs=1e-9)


def test_confusion_matrix_matches_sklearn(fake_preds):
    skm = pytest.importorskip("sklearn.metrics")
    labels, probs = fake_preds
    preds = probs.argmax(1)
    np.testing.assert_array_equal(
        confusion_matrix(labels, preds, 4), skm.confusion_matrix(labels, preds)
    )


def test_classification_summary_matches_sklearn_report(fake_preds):
    skm = pytest.importorskip("sklearn.metrics")
    labels, probs = fake_preds
    names = ["a", "b", "c", "d"]
    s = classification_summary(labels, probs, names)
    ref = skm.classification_report(
        labels, probs.argmax(1), target_names=names, output_dict=True
    )
    for i, n in enumerate(names):
        assert s["per_class"][n]["precision"] == pytest.approx(ref[n]["precision"])
        assert s["per_class"][n]["recall"] == pytest.approx(ref[n]["recall"])
        assert s["per_class"][n]["f1"] == pytest.approx(ref[n]["f1-score"])
    assert s["accuracy"] == pytest.approx(ref["accuracy"])


def test_sensitivity_specificity_perfect_and_random():
    cm = np.diag([10, 20, 30])
    sens, spec = sensitivity_specificity(cm)
    assert sens == 1.0 and spec == 1.0


def test_sensitivity_specificity_off_diagonal():
    """Hand-computed asymmetric confusion matrix — catches a sens/spec swap,
    a transposed-cm indexing bug, and micro-vs-macro averaging (the diagonal
    case is blind to all three)."""
    # rows = true, cols = predicted
    cm = np.array([[8, 2],
                   [4, 6]])
    # class 0: tp=8 fn=2 -> sens 0.8; tn=6 fp=4 -> spec 0.6
    # class 1: tp=6 fn=4 -> sens 0.6; tn=8 fp=2 -> spec 0.8
    sens, spec = sensitivity_specificity(cm)
    np.testing.assert_allclose(sens, (0.8 + 0.6) / 2)
    np.testing.assert_allclose(spec, (0.6 + 0.8) / 2)
    # asymmetric 3-class: macro-average of per-class rates
    cm3 = np.array([[5, 1, 0],
                    [2, 7, 1],
                    [0, 3, 9]])
    sens3, spec3 = sensitivity_specificity(cm3)
    np.testing.assert_allclose(sens3, np.mean([5 / 6, 7 / 10, 9 / 12]))
    n = cm3.sum()
    specs = []
    for i in range(3):
        fp = cm3[:, i].sum() - cm3[i, i]
        tn = n - cm3[i].sum() - fp
        specs.append(tn / (tn + fp))
    np.testing.assert_allclose(spec3, np.mean(specs))


def test_stratified_kfold_properties():
    labels = np.repeat(np.arange(4), [50, 30, 15, 5])
    folds = list(stratified_kfold(labels, 5, seed=0))
    assert len(folds) == 5
    all_val = np.concatenate([v for _, v in folds])
    assert sorted(all_val) == list(range(100))  # partition
    for train, val in folds:
        assert len(np.intersect1d(train, val)) == 0
        # stratification: class proportions within +-1 sample per fold
        for cls, total in zip(range(4), [50, 30, 15, 5]):
            got = (labels[val] == cls).sum()
            assert abs(got - total / 5) <= 1


def test_stratified_kfold_never_empty_fold():
    """On-chip regression (multitrial over a small staged corpus): 21
    samples / 4 classes / 10 folds — every class has < n_splits members, so
    a per-class-restarting deal leaves folds 5-9 EMPTY and the eval scan
    crashes opaquely. sklearn's StratifiedKFold keeps overall fold sizes
    within +-1 (never empty while n >= k); ours must too."""
    rng = np.random.default_rng(0)
    labels = rng.permutation(np.repeat(np.arange(4), [6, 5, 5, 5]))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", UserWarning)
        folds = list(stratified_kfold(labels, 10, seed=42))
    sizes = [len(v) for _, v in folds]
    assert min(sizes) >= 1 and max(sizes) - min(sizes) <= 1
    all_val = np.sort(np.concatenate([v for _, v in folds]))
    assert (all_val == np.arange(21)).all()  # still a partition
    # per-class stratification invariant holds under the continued deal
    for _, val in folds:
        for cls, total in zip(range(4), [6, 5, 5, 5]):
            assert abs((labels[val] == cls).sum() - total / 10) <= 1


def test_stratified_kfold_sklearn_edge_semantics():
    labels = np.repeat(np.arange(2), 3)  # n=6
    with pytest.raises(ValueError, match="n_splits=10"):
        list(stratified_kfold(labels, 10))
    with pytest.warns(UserWarning, match="least populated class"):
        list(stratified_kfold(labels, 5))


def test_stratified_holdout_70_20_10():
    labels = np.repeat(np.arange(5), 100)
    tr, va, te = stratified_holdout(labels, (0.7, 0.2, 0.1), seed=42)
    assert len(tr) + len(va) + len(te) == 500
    assert len(te) == 50 and len(va) == 100
    for part, frac in ((tr, 0.7), (va, 0.2), (te, 0.1)):
        for cls in range(5):
            assert abs((labels[part] == cls).sum() - 100 * frac) <= 1


def test_absent_class_yields_nan_like_sklearn():
    """A class with no positive samples must produce NaN (sklearn roc_curve
    semantics), which propagates through mAUC exactly as the reference's
    np.mean over per-class AUCs would — not a silent AUC=0."""
    rng = np.random.default_rng(3)
    labels = rng.integers(0, 2, 40)  # class 2 never occurs
    probs = rng.dirichlet(np.ones(3), size=40)
    fpr, tpr, _ = roc_curve((labels == 2).astype(int), probs[:, 2])
    assert np.isnan(tpr).all() and not np.isnan(fpr).any()
    assert np.isnan(auc(fpr, tpr))
    assert np.isnan(mean_auc(labels, probs))
    # all-positive degenerate case: fpr side is NaN
    fpr2, _, _ = roc_curve(np.ones(10, int), np.linspace(0, 1, 10))
    assert np.isnan(fpr2).all()


def test_classification_report_text_matches_sklearn():
    """Byte-identical to sklearn's classification_report for the same
    predictions — the reference PRINTS that text at test evaluation
    (octmnist_ft_vit2spn.py:168) and downstream tooling may parse it."""
    skm = pytest.importorskip("sklearn.metrics")
    from vit2spn_tpu.evals.metrics import (
        classification_report_text,
        classification_summary,
    )

    rng = np.random.default_rng(7)
    for k in (2, 4, 5):
        n = int(rng.integers(30, 200))
        labels = rng.integers(0, k, n)
        probs = rng.random((n, k))
        probs /= probs.sum(1, keepdims=True)
        names = [f"class_{i}" for i in range(k)]
        ours = classification_report_text(
            classification_summary(labels, probs, names)
        )
        ref = skm.classification_report(
            labels, probs.argmax(1), labels=list(range(k)), target_names=names
        )
        assert ours == ref
