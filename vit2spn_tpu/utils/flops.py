"""FLOPs / parameter introspection.

Replaces fvcore FlopCountAnalysis (ssp_vit2spn_tiny.py:184-194) with XLA's
own cost analysis on the compiled computation — the number the hardware
actually executes, not a tracer estimate.
"""

from __future__ import annotations

import jax


def forward_flops(fn, *example_args) -> float:
    """FLOPs of jit(fn)(*example_args) per XLA cost analysis."""
    lowered = jax.jit(fn).lower(*example_args)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):  # older jax returns a list per computation
        cost = cost[0]
    return float(cost.get("flops", -1.0))


def dual_stream_report(cfg, params) -> dict:
    """The reference's startup introspection (ssp_vit2spn_tiny.py:184-194,
    235-239): trainable parameter count, dual-stream forward GFLOPs at
    batch 1, AND the component-wise breakdown — per online backbone,
    projection head, prediction head, plus their sum — matching the
    reference's "Alternative: Component-wise calculation"
    (ssp_vit2spn_tiny.py:188-194, which sums backbone_1 + backbone_2 +
    proj + pred; target backbones are excluded from that sum there too).
    All numbers come from the COMPILED computation rather than a tracer.
    Safe to call on CPU; returns None entries if cost analysis is
    unsupported on the backend."""
    import jax.numpy as jnp

    from vit2spn_tpu.models.heads import mlp_head_apply
    from vit2spn_tpu.models.ssp import dual_stream_forward, backbone_slice, num_streams
    from vit2spn_tpu.models.vit import count_params, vit_features

    trainable = count_params(params.online) + count_params(params.heads)
    total = trainable + count_params(params.target)
    size = cfg.vit.image_size
    dummy = jnp.zeros((1, size, size, 3), jnp.float32)

    def gflops(fn, *xs):
        try:
            f = forward_flops(fn, *xs)
        except Exception:  # noqa: BLE001 - cost analysis is backend-dependent
            return None
        return round(f / 1e9, 4) if f > 0 else None

    # keep BOTH outputs live: taking only [0] lets XLA dead-code-eliminate
    # the whole target path, silently halving the count vs the reference's
    # fvcore full-forward number (ssp_vit2spn_tiny.py:185-187)
    full = gflops(
        lambda v1, v2: dual_stream_forward(params, v1, v2, cfg),
        dummy, dummy,
    )
    n = num_streams(cfg)
    bb0 = backbone_slice(params.online, 0)
    backbone = gflops(lambda x: vit_features(bb0, x, cfg.vit), dummy)
    proj = gflops(
        lambda z: mlp_head_apply(params.heads["projection"], z),
        jnp.zeros((1, n * cfg.vit.hidden_size), jnp.float32),
    )
    pred = gflops(
        lambda z: mlp_head_apply(params.heads["prediction"], z),
        jnp.zeros((1, cfg.proj_dim), jnp.float32),
    )
    parts = (backbone, proj, pred)
    componentwise = (
        round(n * backbone + proj + pred, 4)
        if all(p is not None for p in parts) else None
    )
    return {
        "trainable_params": int(trainable),
        "total_params": int(total),
        "forward_gflops": full,
        "backbone_gflops": backbone,
        "projection_head_gflops": proj,
        "prediction_head_gflops": pred,
        # n online backbones + proj + pred (ssp_vit2spn_tiny.py:192-194)
        "componentwise_gflops": componentwise,
    }
