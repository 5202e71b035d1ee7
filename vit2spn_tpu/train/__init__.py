from vit2spn_tpu.train.optim import (
    EarlyStopping,
    ReduceLROnPlateau,
    balanced_class_weights,
)
from vit2spn_tpu.train.ssp import SSPTrainer, SSPTrainState
from vit2spn_tpu.train.finetune import FineTuneTrainer, FineTuneState

__all__ = [
    "EarlyStopping",
    "ReduceLROnPlateau",
    "balanced_class_weights",
    "SSPTrainer",
    "SSPTrainState",
    "FineTuneTrainer",
    "FineTuneState",
]
