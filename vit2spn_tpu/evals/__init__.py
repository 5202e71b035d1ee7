from vit2spn_tpu.evals.metrics import (
    classification_summary,
    confusion_matrix,
    mean_auc,
    per_class_roc,
    sensitivity_specificity,
)
from vit2spn_tpu.evals.kfold import stratified_kfold
from vit2spn_tpu.evals.protocol import CVResult, run_cv_protocol

__all__ = [
    "classification_summary",
    "confusion_matrix",
    "mean_auc",
    "per_class_roc",
    "sensitivity_specificity",
    "stratified_kfold",
    "CVResult",
    "run_cv_protocol",
]
