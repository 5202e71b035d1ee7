from vit2spn_tpu.ops.attention import default_model_impl, multi_head_attention
from vit2spn_tpu.ops.fused_block import fused_block

__all__ = ["multi_head_attention", "default_model_impl", "fused_block"]
