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
