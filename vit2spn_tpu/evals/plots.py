"""Figure artifacts (C12/C14).

Reproduces every matplotlib artifact family the reference emits:
  * all-fold ROC curves (octmnist_ft_vit2spn.py:217-227)
  * confusion-matrix heatmap (:161-167)
  * SSP loss curve (ssp_ssl/ssl_vit2spn_scratch.py:210-218)
  * 3-panel radar charts (plotting/pt_scratch_radar.py:47-77,
    plotting/ssp_sp_radar.py:47-77) incl. the published hardcoded result
    tables as defaults.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def roc_all_folds(fold_rocs: Dict[int, tuple], fold_aucs: List[float],
                  out_path: str, class_index: int = 0) -> str:
    """fold_rocs[fold] = (fpr_dict, tpr_dict, auc_dict) from per_class_roc."""
    plt = _plt()
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    fig, ax = plt.subplots(figsize=(10, 8))
    for fold, (fpr, tpr, auc_d) in sorted(fold_rocs.items()):
        ax.plot(fpr[class_index], tpr[class_index],
                label=f"Fold {fold + 1} (AUC={auc_d[class_index]:.4f})")
    ax.plot([0, 1], [0, 1], "k--", label="Random")
    mean_auc, std_auc = float(np.mean(fold_aucs)), float(np.std(fold_aucs))
    ax.set_xlabel("False Positive Rate")
    ax.set_ylabel("True Positive Rate")
    ax.set_title(
        f"ROC Curve - All Folds (Mean AUC = {mean_auc:.3f} ± {std_auc:.3f})"
    )
    ax.legend()
    ax.grid(True)
    fig.savefig(out_path, dpi=100)
    plt.close(fig)
    return out_path


def confusion_matrix_plot(cm: np.ndarray, class_names: Sequence[str],
                          out_path: str, title: str = "Confusion Matrix") -> str:
    plt = _plt()
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    fig, ax = plt.subplots(figsize=(6, 5))
    im = ax.imshow(cm, cmap="Blues")
    fig.colorbar(im)
    k = len(class_names)
    ax.set_xticks(range(k)); ax.set_xticklabels(class_names, rotation=45, ha="right")
    ax.set_yticks(range(k)); ax.set_yticklabels(class_names)
    thresh = cm.max() / 2 if cm.max() else 0.5
    for i in range(k):
        for j in range(k):
            ax.text(j, i, str(cm[i, j]), ha="center", va="center",
                    color="white" if cm[i, j] > thresh else "black")
    ax.set_xlabel("Predicted"); ax.set_ylabel("True"); ax.set_title(title)
    fig.tight_layout()
    fig.savefig(out_path, dpi=100)
    plt.close(fig)
    return out_path


def loss_curve(history: List[float], out_path: str,
               title: str = "Self-Supervised Pretraining Loss") -> str:
    plt = _plt()
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    fig, ax = plt.subplots(figsize=(8, 5))
    ax.plot(range(1, len(history) + 1), history, marker="o", markersize=3)
    ax.set_xlabel("Epoch"); ax.set_ylabel("Loss"); ax.set_title(title)
    ax.grid(True)
    fig.tight_layout()
    fig.savefig(out_path, dpi=100)
    plt.close(fig)
    return out_path


# ---------------------------------------------------------------------------
# Radar charts — published result tables from the reference plotting scripts
# ---------------------------------------------------------------------------

RADAR_METRICS = ["mAUC", "Accuracy", "Precision", "Sensitivity", "F1 Score"]

# plotting/pt_scratch_radar.py:50-54 (without -> with pretraining)
PT_SCRATCH_RESULTS = {
    "OCTMNIST (5k)": {
        "w/o Pre-Training": [0.543, 0.33, 0.26, 0.33, 0.29],
        "with Pre-Training": [0.878, 0.74, 0.74, 0.74, 0.74],
    },
    "OCTID (0.5k)": {
        "w/o Pre-Training": [0.613, 0.44, 0.35, 0.44, 0.37],
        "with Pre-Training": [0.981, 0.90, 0.91, 0.90, 0.90],
    },
    "UCSD OCT (2k)": {
        "w/o Pre-Training": [0.705, 0.47, 0.73, 0.47, 0.50],
        "with Pre-Training": [0.973, 0.92, 0.93, 0.92, 0.92],
    },
}

# plotting/ssp_sp_radar.py:48-55 (supervised -> self-supervised pretraining)
SSP_SP_RESULTS = {
    "OCTMNIST (5k)": {
        "SP": [0.880, 0.71, 0.71, 0.71, 0.71],
        "SSP": [0.867, 0.71, 0.73, 0.71, 0.71],
    },
    "OCTID (0.5k)": {
        "SP": [0.968, 0.86, 0.86, 0.86, 0.85],
        "SSP": [0.966, 0.94, 0.95, 0.94, 0.94],
    },
    "UCSD OCT (2k)": {
        "SP": [0.968, 0.89, 0.93, 0.89, 0.90],
        "SSP": [0.966, 0.92, 0.93, 0.92, 0.92],
    },
}


def radar_chart(
    results: Optional[Dict[str, Dict[str, List[float]]]],
    out_path: str,
    metrics: Sequence[str] = tuple(RADAR_METRICS),
) -> str:
    """3-panel radar comparison (plotting/*_radar.py:47-77). `results` maps
    panel title -> {series name -> metric values}; defaults to the published
    pretraining-ablation table."""
    plt = _plt()
    results = results or PT_SCRATCH_RESULTS
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    n_panels = len(results)
    angles = np.linspace(0, 2 * np.pi, len(metrics), endpoint=False).tolist()
    angles += angles[:1]

    fig, axes = plt.subplots(
        1, n_panels, figsize=(5 * n_panels, 5), subplot_kw=dict(polar=True)
    )
    axes = np.atleast_1d(axes)
    for ax, (panel, series) in zip(axes, results.items()):
        for name, vals in series.items():
            v = list(vals) + [vals[0]]
            ax.plot(angles, v, label=name, linewidth=1.5)
            ax.fill(angles, v, alpha=0.15)
        ax.set_xticks(angles[:-1])
        ax.set_xticklabels(metrics, fontsize=8)
        ax.set_ylim(0, 1)
        ax.set_title(panel, fontsize=10)
        ax.legend(loc="lower right", fontsize=7)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path
