"""The fine-tune + cross-validation experiment protocol (C4-C8).

One driver replaces the module-level flow of every `*_ft_*.py` reference
script (octmnist_ft_vit2spn.py:171-227, octird_ft_vit2spn.py:209-264,
ucsdoct_ft_vit2spn.py:255-304, multitrial/*):

  1. subset selection — OCTMNIST: random fraction of the train split +
     random test subset (:52-59); OCTID/UCSD: absolute-size subset of the
     merged folder dataset + stratified 70/20/10 holdout whose 10% is the
     final test set (octird_ft_vit2spn.py:72-74).
  2. stratified k-fold CV over the subset; per fold: balanced class weights
     from the train-fold labels, a FRESH model with the SSP backbone loaded,
     fine-tune with plateau scheduler + early stop, per-class val ROC/mAUC.
  3. best-fold model (by val mAUC — the reference's model-selection quirk,
     octmnist_ft_vit2spn.py:200-202) evaluated on the held-out test set:
     confusion matrix + classification report (+ multitrial sens/spec/
     confidence).
  4. fold-mAUC mean/std summary.

Faithfulness note (kept as-is, it defines the numbers): for OCTID/UCSD the
CV folds are drawn from the FULL subset, which overlaps the holdout test
split (octird_ft_vit2spn.py:215 uses subset_dataset, not train_dataset).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np

from vit2spn_tpu.core.config import FineTuneConfig
from vit2spn_tpu.data.datasets import Dataset, load_dataset
from vit2spn_tpu.evals.kfold import stratified_holdout, stratified_kfold
from vit2spn_tpu.evals.metrics import classification_summary, mean_auc, per_class_roc
from vit2spn_tpu.train.finetune import FineTuneTrainer
from vit2spn_tpu.train.optim import balanced_class_weights
from vit2spn_tpu.utils.logging import MetricLogger


@dataclass
class CVResult:
    fold_aucs: List[float]
    best_fold: int
    best_auc: float
    test_summary: dict
    fold_rocs: Dict[int, tuple] = field(default_factory=dict)
    # per-fold TEST metrics (multitrial protocol): every fold's model is
    # evaluated on the held-out test set (multitrial/octmnist_ft_vit2spn.py:
    # 230-241); populated when run_cv_protocol(per_fold_test=True).
    fold_test_metrics: List[dict] = field(default_factory=list)

    @property
    def mean_auc(self) -> float:
        return float(np.mean(self.fold_aucs))

    @property
    def std_auc(self) -> float:
        return float(np.std(self.fold_aucs))

    def multitrial_aggregate(self) -> Dict[str, dict]:
        """mean±std ACROSS THE FOLDS of one run — the published estimator
        (multitrial/octmnist_ft_vit2spn.py:242-263): top-1 accuracy /
        sensitivity / specificity / confidence from each fold's test-set
        evaluation, mAUC from each fold's val ROC."""
        assert self.fold_test_metrics, "run_cv_protocol(per_fold_test=True) first"
        rows = [dict(m, mauc=a) for m, a in
                zip(self.fold_test_metrics, self.fold_aucs)]
        return {
            k: {"mean": float(np.mean([r[k] for r in rows])),
                "std": float(np.std([r[k] for r in rows]))}
            for k in rows[0]
        }


def select_subsets(cfg: FineTuneConfig, ds: Dataset, seed: Optional[int] = None):
    """Returns (cv_dataset, test_dataset) per the dataset's protocol."""
    data = cfg.data
    seed = cfg.seed if seed is None else seed
    rng = np.random.default_rng(seed)
    if data.subset_fraction is not None:
        train = ds.split("train") if "train" in ds.splits else ds
        test = ds.split("test") if "test" in ds.splits else ds
        n_sub = int(len(train) * data.subset_fraction)
        sub_idx = rng.choice(len(train), size=n_sub, replace=False)
        cv_ds = train.subset(sub_idx, "cv")
        n_test = min(data.test_subset_size or len(test), len(test))
        test_idx = rng.choice(len(test), size=n_test, replace=False)
        test_ds = test.subset(test_idx, "test")
        return cv_ds, test_ds
    # folder protocol: absolute subset + 70/20/10 holdout, CV over full subset
    pool = ds.split("all") if "all" in ds.splits else ds
    n_sub = min(data.subset_size or len(pool), len(pool))
    sub_idx = rng.choice(len(pool), size=n_sub, replace=False)
    subset = pool.subset(sub_idx, "subset")
    _, _, test_idx = stratified_holdout(subset.labels, (0.7, 0.2, 0.1), seed=seed)
    return subset, subset.subset(test_idx, "test")


def run_cv_protocol(
    cfg: FineTuneConfig,
    dataset: Optional[Dataset] = None,
    backbone_params: Optional[dict] = None,
    logger: Optional[MetricLogger] = None,
    epochs: Optional[int] = None,
    trial_seed: Optional[int] = None,
    mesh=None,
    eval_augment: bool = True,
    per_fold_test: bool = False,
    trial: int = 0,
) -> CVResult:
    """`trial_seed` re-draws the data (subsets + fold assignment);
    `trial` re-draws only the training stochasticity (init/shuffle/aug
    keys) with the data held fixed — the latter is what the reference's
    repeated "retraining runs" vary (its subset and folds are pinned at
    seed 42; multitrial/octmnist_ft_vit2spn.py:28,58,193)."""
    logger = logger or MetricLogger(echo=True)
    ds = dataset if dataset is not None else load_dataset(
        cfg.data.name, root=cfg.data.root
    )
    num_classes = ds.num_classes
    cv_ds, test_ds = select_subsets(cfg, ds, seed=trial_seed)
    logger.log("protocol", dataset=ds.name, cv_size=len(cv_ds), test_size=len(test_ds))

    fold_aucs: List[float] = []
    fold_rocs: Dict[int, tuple] = {}
    fold_test_metrics: List[dict] = []
    best_auc, best_fold, best_trainer = 0.0, -1, None
    seed = cfg.seed if trial_seed is None else trial_seed
    test_weights = balanced_class_weights(test_ds.labels, num_classes)

    for fold, (train_idx, val_idx) in enumerate(
        stratified_kfold(cv_ds.labels, cfg.k_folds, seed=seed)
    ):
        train_fold = cv_ds.subset(train_idx)
        val_fold = cv_ds.subset(val_idx)
        weights = balanced_class_weights(train_fold.labels, num_classes)

        trainer = FineTuneTrainer(
            cfg,
            num_classes=num_classes,
            backbone_params=backbone_params,
            logger=logger,
            fold=fold,
            mesh=mesh,
            eval_augment=eval_augment,
            trial=trial,
        )
        trainer.fit(train_fold, val_fold, weights, epochs=epochs,
                    tag=f"fold{fold}")

        _, probs, labels = trainer.evaluate(val_fold, weights)
        fold_rocs[fold] = per_class_roc(labels, probs)
        fold_mauc = mean_auc(labels, probs)
        fold_aucs.append(fold_mauc)
        logger.log("fold_result", fold=fold, mauc=fold_mauc)

        if per_fold_test:
            # multitrial protocol: EVERY fold's model gets a test-set
            # evaluation; mean±std across folds is the published estimator
            # (multitrial/octmnist_ft_vit2spn.py:230-241,249-263).
            _, tprobs, tlabels = trainer.evaluate(test_ds, test_weights)
            ts = classification_summary(tlabels, tprobs, ds.class_names)
            fold_test_metrics.append(dict(
                accuracy=ts["accuracy"],
                sensitivity=ts["sensitivity"],
                specificity=ts["specificity"],
                confidence=ts["mean_confidence"],
            ))
            logger.log("fold_test", fold=fold, **fold_test_metrics[-1])

        if fold_mauc > best_auc:
            best_auc, best_fold, best_trainer = fold_mauc, fold, trainer

    if best_trainer is None:
        # every fold's mAUC was NaN (a class absent from val labels) — the
        # reference would crash here; fall back to the last fold with a warning
        best_trainer, best_fold = trainer, fold
        logger.log("warning", message="all fold mAUCs NaN; using last fold")
    _, probs, labels = best_trainer.evaluate(test_ds, test_weights)
    summary = classification_summary(labels, probs, ds.class_names)
    logger.log(
        "cv_summary",
        mean_auc=float(np.mean(fold_aucs)),
        std_auc=float(np.std(fold_aucs)),
        best_auc=best_auc,
        test_accuracy=summary["accuracy"],
        test_mauc=summary["mean_auc"],
    )
    return CVResult(
        fold_aucs=fold_aucs,
        best_fold=best_fold,
        best_auc=best_auc,
        test_summary=summary,
        fold_rocs=fold_rocs,
        fold_test_metrics=fold_test_metrics,
    )


def _trial_state_key(cfg: FineTuneConfig, epochs) -> dict:
    """Resume key = every result-affecting config field (the full config
    tree minus the mesh, whose layout is numerics-invariant — DP/TP equality
    is tested) plus the epochs override. Any change invalidates the state
    file rather than silently mixing differently-configured trials."""
    import dataclasses
    import json

    key = dataclasses.asdict(cfg)
    key.pop("mesh", None)
    key["epochs_override"] = epochs
    # v2: trials hold data fixed and vary training stochasticity (the
    # reference's estimator); invalidates v1 state files, whose trials
    # re-drew the subsets/folds instead
    key["estimator"] = 2
    # fold algorithm v2: the stratified deal continues across classes
    # (evals/kfold.py, commit 23cb8ca) — a different partition than v1's
    # per-class-restarting deal. Invalidates in-flight pre-fix states so a
    # resumed aggregate never mixes trials over two different partitions
    # ("trials hold data fixed" would silently break otherwise).
    key["fold_algorithm"] = 2
    # normalize through JSON (tuples -> lists) so the in-memory key compares
    # equal to one read back from the state file
    return json.loads(json.dumps(key))


def _load_trial_state(path: str, cfg: FineTuneConfig, epochs=None) -> list:
    """Completed-trial records from a previous (killed) run — resumable
    multitrial."""
    import json
    import os

    if not (path and os.path.exists(path)):
        return []
    with open(path) as f:
        state = json.load(f)
    if state.get("key") != _trial_state_key(cfg, epochs):
        return []
    return state.get("trials", [])


def _save_trial_state(path: str, cfg: FineTuneConfig, trials: list,
                      epochs=None) -> None:
    import json
    import os

    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"key": _trial_state_key(cfg, epochs), "trials": trials}, f)
    os.replace(tmp, path)  # atomic like train/checkpoint.py


def run_multitrial(
    cfg: FineTuneConfig,
    dataset: Optional[Dataset] = None,
    backbone_params: Optional[dict] = None,
    logger: Optional[MetricLogger] = None,
    epochs: Optional[int] = None,
    mesh=None,
    resume_path: Optional[str] = None,
) -> dict:
    """multitrial/*: one run evaluates EVERY fold's model on the held-out test
    set and reports mean±std ACROSS THE FOLDS of top-1 / sensitivity /
    specificity / confidence (+ val mAUC across folds) — the published
    estimator (multitrial/octmnist_ft_vit2spn.py:230-241,249-263).

    `cfg.num_trials > 1` repeats that whole run with the DATA HELD FIXED
    (same subsets, same fold assignment — the reference pins both at seed
    42, multitrial/octmnist_ft_vit2spn.py:28,58,193) while the training
    stochasticity (init, shuffles, augment/dropout keys) is re-drawn per
    trial — exactly what varies between the reference's manual "5
    retraining runs" (README.md:46), whose torch init and loader order are
    unseeded. `across_trials` then reports mean±std of the per-trial means.

    `resume_path`: JSON file persisting each completed trial — a killed run
    resumes at the next trial instead of repeating hours of fine-tuning
    (trial results are deterministic given the per-trial seed, so resumed
    aggregates equal a single uninterrupted run's)."""
    logger = logger or MetricLogger(echo=True)
    trials = _load_trial_state(resume_path, cfg, epochs) if resume_path else []
    if trials:
        logger.log("multitrial_resume", completed=len(trials),
                   total=cfg.num_trials, path=resume_path)
    for trial in range(len(trials), cfg.num_trials):
        res = run_cv_protocol(
            cfg, dataset, backbone_params, logger, epochs,
            mesh=mesh, per_fold_test=True, trial=trial,
        )
        agg = res.multitrial_aggregate()
        trials.append({
            "fold_metrics": res.fold_test_metrics,
            "fold_aucs": res.fold_aucs,
            "aggregate": agg,
        })
        logger.log("trial", trial=trial, **{
            f"{k}_{s}": v[s] for k, v in agg.items() for s in ("mean", "std")
        })
        if resume_path:
            _save_trial_state(resume_path, cfg, trials, epochs)
    out = {"trials": trials, "aggregate": trials[0]["aggregate"]}
    if cfg.num_trials > 1:
        keys = trials[0]["aggregate"].keys()
        out["across_trials"] = {
            k: {
                "mean": float(np.mean([t["aggregate"][k]["mean"] for t in trials])),
                "std": float(np.std([t["aggregate"][k]["mean"] for t in trials])),
            }
            for k in keys
        }
    logger.log("multitrial_summary", **{
        f"{k}_{s}": v[s]
        for k, v in out.get("across_trials", out["aggregate"]).items()
        for s in ("mean", "std")
    })
    return out
