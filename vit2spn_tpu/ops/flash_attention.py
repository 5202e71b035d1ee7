"""Fused attention Pallas TPU kernels.

For ViT-Tiny the sequence is tiny (S=197, head_dim=64), so the whole
per-(batch, head) problem fits in VMEM: Q, K, V are ~50 KB each and the fp32
score matrix ~260 KB. The kernels therefore use one grid program per
(batch*head) with no inner tiling loop:

  forward:  S = QK^T * scale -> masked row-softmax (fp32) -> O = PV
  backward: recompute P, then dV = P^T dO; dP = dO V^T;
            dS = P * (dP - rowsum(dP * P)); dQ = dS K * scale;
            dK = dS^T Q * scale

The payoff vs the XLA einsum path is HBM traffic: XLA materializes the
(B, H, S, S) probabilities to HBM (~57 MB per microbatch-layer at B=128);
here scores/probs live and die in VMEM in both passes.

Sequence length is padded to a multiple of 128 lanes at the wrapper; key
padding is masked with -inf inside the kernel (query padding rows compute
garbage that the wrapper slices off).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# single source of truth for the pad/mask constants shared by the kernel
# modules — a divergence between the two would silently change masking
from vit2spn_tpu.ops.fused_block import NEG_INF, _round_up  # noqa: F401


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, seq_len: int, scale: float):
    q = q_ref[0].astype(jnp.float32)  # (SP, D)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (SP, SP)
    sp = scores.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, (sp, sp), 1)
    scores = jnp.where(col < seq_len, scores, NEG_INF)
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.dot(p, v, preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


def _bwd_kernel(
    q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
    *, seq_len: int, scale: float,
):
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)

    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    sp = scores.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, (sp, sp), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (sp, sp), 0)
    scores = jnp.where(col < seq_len, scores, NEG_INF)
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    # zero out padded query rows so dK/dV get no contribution from them
    p = jnp.where(row < seq_len, p, 0.0)

    dv = jax.lax.dot_general(  # P^T dO
        p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dp = jax.lax.dot_general(  # dO V^T
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.dot(ds, k, preferred_element_type=jnp.float32) * scale
    dk = jax.lax.dot_general(  # dS^T Q
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale

    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _spec(sp, d):
    return pl.BlockSpec((1, sp, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash(q, k, v, seq_len: int, interpret: bool):
    return _flash_fwd_impl(q, k, v, seq_len, interpret)


def _flash_fwd_impl(q, k, v, seq_len, interpret):
    # q, k, v: (BH, SP, D)
    bh, sp, d = q.shape
    scale = 1.0 / (d**0.5)
    kern = functools.partial(_fwd_kernel, seq_len=seq_len, scale=scale)
    return pl.pallas_call(
        kern,
        grid=(bh,),
        in_specs=[_spec(sp, d)] * 3,
        out_specs=_spec(sp, d),
        out_shape=jax.ShapeDtypeStruct((bh, sp, d), q.dtype),
        interpret=interpret,
    )(q, k, v)


def _flash_fwd(q, k, v, seq_len, interpret):
    return _flash_fwd_impl(q, k, v, seq_len, interpret), (q, k, v)


def _flash_bwd(seq_len, interpret, res, g):
    q, k, v = res
    bh, sp, d = q.shape
    scale = 1.0 / (d**0.5)
    kern = functools.partial(_bwd_kernel, seq_len=seq_len, scale=scale)
    dq, dk, dv = pl.pallas_call(
        kern,
        grid=(bh,),
        in_specs=[_spec(sp, d)] * 4,
        out_specs=[_spec(sp, d)] * 3,
        out_shape=[jax.ShapeDtypeStruct((bh, sp, d), q.dtype)] * 3,
        interpret=interpret,
    )(q, k, v, g)
    return dq, dk, dv


_flash.defvjp(_flash_fwd, _flash_bwd)


def mha_pallas(
    q: jax.Array, k: jax.Array, v: jax.Array, interpret: bool = False
) -> jax.Array:
    """Attention over (B, S, H, Dh); returns (B, S, H, Dh).

    Drop-in replacement for ops.attention.mha_xla.
    """
    b, s, h, d = q.shape
    sp = _round_up(s, 128)

    def prep(x):
        x = x.transpose(0, 2, 1, 3).reshape(b * h, s, d)
        return jnp.pad(x, ((0, 0), (0, sp - s), (0, 0)))

    out = _flash(prep(q), prep(k), prep(v), s, interpret)
    out = out[:, :s, :].reshape(b, h, s, d).transpose(0, 2, 1, 3)
    return out.astype(v.dtype)
