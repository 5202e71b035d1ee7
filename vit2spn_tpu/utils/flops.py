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
    235-239): trainable parameter count + dual-stream forward GFLOPs at
    batch 1, computed from the COMPILED computation rather than a tracer.
    Safe to call on CPU; returns flops=-1 if cost analysis is unsupported."""
    import jax.numpy as jnp

    from vit2spn_tpu.models.ssp import dual_stream_forward
    from vit2spn_tpu.models.vit import count_params

    trainable = count_params(params.online) + count_params(params.heads)
    total = trainable + count_params(params.target)
    size = cfg.vit.image_size
    dummy = jnp.zeros((1, size, size, 3), jnp.float32)
    try:
        flops = forward_flops(
            lambda v1, v2: dual_stream_forward(params, v1, v2, cfg)[0],
            dummy, dummy,
        )
    except Exception:  # noqa: BLE001 - cost analysis is backend-dependent
        flops = -1.0
    return {
        "trainable_params": int(trainable),
        "total_params": int(total),
        "forward_gflops": round(flops / 1e9, 4) if flops > 0 else None,
    }
