from vit2spn_tpu.core.config import (
    AugmentConfig,
    DataConfig,
    FineTuneConfig,
    MeshConfig,
    SSPConfig,
    ViTConfig,
)
from vit2spn_tpu.core.dtypes import DTypePolicy
from vit2spn_tpu.core.presets import PRESETS, get_preset

__all__ = [
    "AugmentConfig",
    "DataConfig",
    "FineTuneConfig",
    "MeshConfig",
    "SSPConfig",
    "ViTConfig",
    "DTypePolicy",
    "PRESETS",
    "get_preset",
]
