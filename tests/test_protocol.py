"""Mini end-to-end: the full CV protocol on CPU with the tiny model
(SURVEY.md section 4 — CPU-runnable end-to-end is part of the test strategy)."""

import dataclasses

import numpy as np
import pytest

from vit2spn_tpu.core.config import DataConfig, AugmentConfig
from vit2spn_tpu.data.datasets import synthetic_dataset
from vit2spn_tpu.evals.protocol import run_cv_protocol, select_subsets
from vit2spn_tpu.utils.logging import MetricLogger


QUIET = MetricLogger(echo=False)


def _cfg(tiny_ft, **kw):
    data = DataConfig(
        name="synthetic",
        augment=AugmentConfig(out_size=32, enabled=False),
        subset_fraction=0.5,
        test_subset_size=32,
    )
    return dataclasses.replace(
        tiny_ft, data=data, k_folds=3, epochs=1, use_early_stop=False,
        use_scheduler=False, **kw
    )


def test_select_subsets_fraction_protocol(tiny_ft):
    cfg = _cfg(tiny_ft)
    ds = synthetic_dataset(split_sizes={"train": 100, "test": 60})
    cv_ds, test_ds = select_subsets(cfg, ds)
    assert len(cv_ds) == 50  # fraction 0.5 of train
    assert len(test_ds) == 32


def test_select_subsets_holdout_protocol(tiny_ft):
    cfg = _cfg(tiny_ft)
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(
            cfg.data, subset_fraction=None, subset_size=60, holdout_split=True
        ),
    )
    ds = synthetic_dataset(split_sizes={"all": 100})
    cv_ds, test_ds = select_subsets(cfg, ds)
    assert len(cv_ds) == 60
    assert len(test_ds) == 6  # 10% of subset
    # holdout test indices must come from the subset (reference leakage quirk
    # kept: CV runs over the full subset incl. test rows)
    assert set(test_ds.labels).issubset(set(cv_ds.labels))


def test_cv_protocol_end_to_end(tiny_ft):
    cfg = _cfg(tiny_ft)
    ds = synthetic_dataset(split_sizes={"train": 96, "test": 48}, seed=5)
    res = run_cv_protocol(cfg, dataset=ds, logger=QUIET)
    assert len(res.fold_aucs) == 3
    assert 0.0 <= res.mean_auc <= 1.0
    assert res.best_fold in (0, 1, 2)
    s = res.test_summary
    assert s["confusion_matrix"].sum() == 32
    assert set(s["per_class"]) == set(ds.class_names)
    assert 0.0 <= s["accuracy"] <= 1.0
    assert len(res.fold_rocs) == 3


def test_multitrial_per_fold_test_eval(tiny_ft):
    """multitrial estimator: EVERY fold's model is evaluated on the held-out
    test set; aggregate = mean±std ACROSS FOLDS of one run
    (multitrial/octmnist_ft_vit2spn.py:230-241,249-263)."""
    cfg = _cfg(tiny_ft)
    ds = synthetic_dataset(split_sizes={"train": 96, "test": 48}, seed=7)
    res = run_cv_protocol(cfg, dataset=ds, logger=QUIET, per_fold_test=True)
    assert len(res.fold_test_metrics) == cfg.k_folds
    agg = res.multitrial_aggregate()
    assert set(agg) == {"accuracy", "sensitivity", "specificity",
                        "confidence", "mauc"}
    accs = [m["accuracy"] for m in res.fold_test_metrics]
    np.testing.assert_allclose(agg["accuracy"]["mean"], np.mean(accs))
    np.testing.assert_allclose(agg["accuracy"]["std"], np.std(accs))
    # mAUC aggregates the VAL-fold mAUCs (reference keeps those for the
    # "Mean AUC across folds" line)
    np.testing.assert_allclose(agg["mauc"]["mean"], np.mean(res.fold_aucs))


def test_run_multitrial_output_shape(tiny_ft):
    from vit2spn_tpu.evals.protocol import run_multitrial

    cfg = _cfg(tiny_ft, num_trials=2)
    ds = synthetic_dataset(split_sizes={"train": 96, "test": 48}, seed=9)
    out = run_multitrial(cfg, dataset=ds, logger=QUIET)
    assert len(out["trials"]) == 2
    # aggregate must be the FIRST trial's aggregate, recomputed independently
    # from that trial's recorded per-fold metrics (not compared to itself)
    t0 = out["trials"][0]
    for k in ("accuracy", "sensitivity", "specificity", "confidence"):
        np.testing.assert_allclose(
            out["aggregate"][k]["mean"],
            np.mean([m[k] for m in t0["fold_metrics"]]),
        )
    np.testing.assert_allclose(
        out["aggregate"]["mauc"]["mean"], np.mean(t0["fold_aucs"])
    )
    # across_trials averages the per-trial means
    np.testing.assert_allclose(
        out["across_trials"]["mauc"]["mean"],
        np.mean([np.mean(t["fold_aucs"]) for t in out["trials"]]),
    )
    # trials must actually differ (init/shuffle keys are re-drawn per trial)
    assert out["trials"][0]["fold_aucs"] != out["trials"][1]["fold_aucs"]
    for t in out["trials"]:
        assert len(t["fold_metrics"]) == cfg.k_folds


def test_nan_fold_fallback(tiny_ft, tmp_path):
    """All-NaN fold mAUCs (a class absent from every val fold) must trigger
    the last-fold fallback with a logged warning instead of crashing — the
    reference would raise at the best-model indexing
    (octmnist_ft_vit2spn.py:200-206); see evals/protocol.py:168-172."""
    import json
    import warnings

    cfg = _cfg(tiny_ft)
    ds = synthetic_dataset(
        num_classes=2, split_sizes={"train": 60, "test": 24}, seed=3
    )
    # declare a third class that never occurs: every fold's val labels lack
    # it, so per-class AUC (and thus mAUC) is NaN for every fold
    ds = dataclasses.replace(ds, num_classes=3,
                             class_names=["a", "b", "never"])

    log_path = tmp_path / "log.jsonl"
    with MetricLogger(str(log_path), echo=False) as logger:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")  # sklearn UndefinedMetricWarning
            res = run_cv_protocol(cfg, dataset=ds, logger=logger)

    # sklearn-matching NaN propagation end-to-end through CVResult
    assert all(np.isnan(a) for a in res.fold_aucs)
    assert np.isnan(res.mean_auc)
    assert res.best_fold == cfg.k_folds - 1  # last fold used as fallback
    assert np.isnan(res.test_summary["mean_auc"])
    assert res.test_summary["confusion_matrix"].shape == (3, 3)
    events = [json.loads(l) for l in open(log_path)]
    warn = [e for e in events if e["event"] == "warning"]
    assert warn and "NaN" in warn[0]["message"]


def test_multitrial_resume(tiny_ft, tmp_path):
    """A killed multitrial run resumes at the next trial and produces the
    SAME aggregates as one uninterrupted run (per-trial seeds are
    deterministic)."""
    import json

    from vit2spn_tpu.evals.protocol import run_multitrial

    cfg = _cfg(tiny_ft, num_trials=2)
    ds = synthetic_dataset(split_sizes={"train": 96, "test": 48}, seed=9)
    state = str(tmp_path / "mt.json")

    # "killed after trial 0": run trial 0 only, with the SAME state key
    cfg1 = dataclasses.replace(cfg, num_trials=2)
    res1 = run_cv_protocol(cfg1, dataset=ds, logger=QUIET,
                           trial_seed=cfg.seed + 0, per_fold_test=True)
    from vit2spn_tpu.evals.protocol import _save_trial_state
    _save_trial_state(state, cfg1, [{
        "fold_metrics": res1.fold_test_metrics,
        "fold_aucs": res1.fold_aucs,
        "aggregate": res1.multitrial_aggregate(),
    }])

    events = []

    class _Cap:
        def log(self, event, **kw):
            events.append(event)

    resumed = run_multitrial(cfg, dataset=ds, logger=_Cap(),
                             resume_path=state)
    assert "multitrial_resume" in events
    full = run_multitrial(cfg, dataset=ds, logger=QUIET)
    np.testing.assert_allclose(
        resumed["across_trials"]["accuracy"]["mean"],
        full["across_trials"]["accuracy"]["mean"],
    )
    # state file now holds both trials
    saved = json.load(open(state))
    assert len(saved["trials"]) == 2
    # ANY result-affecting config change invalidates the state instead of
    # mixing differently-configured trials (seed, epochs override, lr,
    # epochs, init_path — the key is the full config tree minus the mesh)
    from vit2spn_tpu.evals.protocol import _load_trial_state
    assert _load_trial_state(state, dataclasses.replace(cfg, seed=7)) == []
    assert _load_trial_state(state, cfg, epochs=1) == []
    assert _load_trial_state(
        state, dataclasses.replace(cfg, learning_rate=5e-4)) == []
    assert _load_trial_state(
        state, dataclasses.replace(cfg, epochs=cfg.epochs + 1)) == []
    assert _load_trial_state(
        state, dataclasses.replace(cfg, init_path="/elsewhere.npz")) == []
    # mesh layout is numerics-invariant and does NOT invalidate
    assert _load_trial_state(
        state,
        dataclasses.replace(
            cfg, mesh=dataclasses.replace(cfg.mesh, model_parallel=2)
        ),
    ) != []
    # a state written under an older fold algorithm (pre-23cb8ca per-class-
    # restarting deal) is a DIFFERENT data partition: must invalidate, never
    # mix into one aggregate
    from vit2spn_tpu.evals.protocol import _trial_state_key
    old = json.load(open(state))
    old["key"].pop("fold_algorithm")
    json.dump(old, open(state, "w"))
    assert _load_trial_state(state, cfg) == []
    assert "fold_algorithm" in _trial_state_key(cfg, None)
