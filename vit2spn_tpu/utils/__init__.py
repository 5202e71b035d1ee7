from vit2spn_tpu.utils.logging import MetricLogger
from vit2spn_tpu.utils.flops import forward_flops

__all__ = ["MetricLogger", "forward_flops"]
