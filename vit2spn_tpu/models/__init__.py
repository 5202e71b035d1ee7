from vit2spn_tpu.models.vit import init_vit, vit_features, vit_forward
from vit2spn_tpu.models.heads import (
    init_classifier_head,
    init_mlp_head,
    classifier_head_apply,
    mlp_head_apply,
)
from vit2spn_tpu.models.hf_convert import (
    convert_hf_state_dict,
    convert_to_hf_state_dict,
    export_reference_pth,
    load_local_state,
    load_pretrained_vit_tiny,
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
    "convert_hf_state_dict",
    "convert_to_hf_state_dict",
    "export_reference_pth",
    "load_local_state",
    "load_pretrained_vit_tiny",
]
