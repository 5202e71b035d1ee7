"""Mixed-precision policy.

The reference uses CUDA AMP fp16 with a GradScaler for SSP pretraining
(ssp_vit2spn_tiny.py:8,175,209-217) and fp32 for fine-tuning. On TPU the
idiomatic equivalent is bf16 compute on the MXU with fp32 master params and
fp32 optimizer/EMA state — bf16's exponent range makes loss scaling
unnecessary, so there is no GradScaler analogue.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class DTypePolicy:
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    # Softmax / layernorm statistics always accumulate in fp32.
    reduce_dtype: jnp.dtype = jnp.float32

    @staticmethod
    def from_str(compute: str) -> "DTypePolicy":
        return DTypePolicy(compute_dtype=jnp.dtype(compute))

    def cast_to_compute(self, tree):
        return jax.tree.map(
            lambda x: x.astype(self.compute_dtype)
            if jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            tree,
        )

    def cast_to_param(self, tree):
        return jax.tree.map(
            lambda x: x.astype(self.param_dtype)
            if jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            tree,
        )


FP32 = DTypePolicy(compute_dtype=jnp.float32)
BF16 = DTypePolicy()
