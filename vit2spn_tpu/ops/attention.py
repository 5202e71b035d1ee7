"""Multi-head self-attention core.

Two interchangeable implementations:

  * `mha_xla`     — einsum formulation; XLA fuses scale+softmax into the
                    matmuls well enough for CPU tests and as a reference.
  * `mha_pallas`  — fused flash-style Pallas TPU kernel (ops/flash_attention.py):
                    per-(batch, head) program, QK^T -> masked softmax -> PV
                    entirely in VMEM, so the (S, S) score matrix never touches
                    HBM. For ViT-Tiny S=197 the whole sequence fits in VMEM.

`multi_head_attention` dispatches on the default backend (TPU -> Pallas,
otherwise XLA) unless overridden via `impl=`.

Replaces: HF `ViTSelfAttention` (torch SDPA/cuDNN) used via
`transformers.ViTModel` in the reference (ssp_vit2spn_tiny.py:112-118).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


def mha_xla(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """Attention over (B, S, H, Dh) tensors; returns (B, S, H, Dh).

    Softmax statistics in fp32 regardless of input dtype (bf16-safe).
    """
    *_, head_dim = q.shape
    scale = 1.0 / jnp.sqrt(jnp.asarray(head_dim, dtype=jnp.float32))
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    probs = jax.nn.softmax(scores * scale, axis=-1)
    return jnp.einsum(
        "bhqk,bkhd->bqhd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(v.dtype)


@functools.lru_cache(maxsize=1)
def default_model_impl() -> Optional[str]:
    """Default whole-model implementation flag for trainers: the fused
    Pallas block kernel on TPU (measured 2.4x faster full train step than
    the XLA path on v5e), plain XLA elsewhere (Mosaic kernels don't compile
    for CPU tests; interpret mode is for correctness only)."""
    return "fused" if jax.default_backend() == "tpu" else None


@functools.lru_cache(maxsize=1)
def _default_impl() -> str:
    # Measured on v5e at ViT-Tiny scale (B=128, S=197, 3 heads): the XLA
    # einsum path outruns the current per-(batch,head) Pallas kernel (12.4 vs
    # 16.0 ms/backbone fwd) because batched GEMMs pipeline better than 384
    # sequential small-K kernel programs, and score HBM traffic is negligible
    # at S=197. Default to XLA; the Pallas kernel remains selectable
    # (impl="pallas") and is the memory-lean choice under remat.
    return "xla"


def multi_head_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, impl: Optional[str] = None
) -> jax.Array:
    impl = impl or _default_impl()
    if impl == "xla":
        return mha_xla(q, k, v)
    if impl == "pallas":
        from vit2spn_tpu.ops.flash_attention import mha_pallas

        return mha_pallas(q, k, v)
    if impl == "pallas_interpret":
        from vit2spn_tpu.ops.flash_attention import mha_pallas

        return mha_pallas(q, k, v, interpret=True)
    raise ValueError(f"unknown attention impl {impl!r}")
