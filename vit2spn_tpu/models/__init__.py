from vit2spn_tpu.models.vit import init_vit, vit_features, vit_forward
from vit2spn_tpu.models.heads import (
    init_classifier_head,
    init_mlp_head,
    classifier_head_apply,
    mlp_head_apply,
)
from vit2spn_tpu.models.ssp import (
    DualStreamParams,
    backbone_slice,
    init_dual_stream,
    init_single_stream,
    dual_stream_forward,
    single_stream_forward,
    ema_update,
)

__all__ = [
    "init_vit",
    "vit_features",
    "vit_forward",
    "init_classifier_head",
    "init_mlp_head",
    "classifier_head_apply",
    "mlp_head_apply",
    "DualStreamParams",
    "backbone_slice",
    "init_dual_stream",
    "init_single_stream",
    "dual_stream_forward",
    "single_stream_forward",
    "ema_update",
]
