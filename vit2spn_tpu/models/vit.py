"""Functional ViT-Tiny backbone.

TPU-first reimplementation of the backbone the reference obtains from
HF `transformers.ViTModel` ("WinKawaks/vit-tiny-patch16-224",
ssp_vit2spn_tiny.py:109-118; explicit scratch config at
ssp_ssl/ssl_vit2spn_scratch.py:100-110). Design choices:

  * Pure functions over a param pytree (no module framework) — trivially
    compatible with jit / shard_map / tree-mapped EMA updates.
  * Transformer blocks run under `lax.scan` over stacked layer params: one
    traced block regardless of depth (fast compiles, identical HLO per layer).
  * Patch embedding is a reshape + matmul, not a conv — a (B, 196, 768) x
    (768, 192) GEMM maps straight onto the MXU.
  * NHWC image layout (TPU-native) instead of torch NCHW.
  * Attention core dispatches to the fused Pallas kernel on TPU
    (vit2spn_tpu.ops.attention).
  * bf16 compute / fp32 params via DTypePolicy; layernorm and softmax
    statistics in fp32.

Feature semantics (critical for parity): the reference pools
`hidden_states[-1].mean(dim=1)` (ssp_vit2spn_tiny.py:116-117) — the mean over
ALL 197 tokens (CLS included) of the last block's output BEFORE the final
layernorm. `vit_features` reproduces exactly that; the final layernorm params
still exist for HF-checkpoint parity and for `last_hidden_state` consumers.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from vit2spn_tpu.core.config import ViTConfig
from vit2spn_tpu.core.dtypes import DTypePolicy, FP32
from vit2spn_tpu.ops.attention import multi_head_attention


def _trunc_normal(key, shape, std=0.02, dtype=jnp.float32):
    # HF _init_weights uses trunc_normal(std=initializer_range=0.02).
    return jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype) * std


def init_vit(key: jax.Array, cfg: ViTConfig) -> dict:
    """Initialize a ViT param pytree (HF-equivalent init distribution)."""
    d, m, layers = cfg.hidden_size, cfg.mlp_dim, cfg.num_layers
    patch_in = cfg.patch_size * cfg.patch_size * cfg.num_channels
    keys = jax.random.split(key, 10)

    def stack(initfn, subkey, shape):
        ks = jax.random.split(subkey, layers)
        return jnp.stack([initfn(k, shape) for k in ks])

    blocks = {
        "ln1_scale": jnp.ones((layers, d)),
        "ln1_bias": jnp.zeros((layers, d)),
        "wqkv": stack(_trunc_normal, keys[2], (d, 3 * d)),
        "bqkv": jnp.zeros((layers, 3 * d)),
        "wo": stack(_trunc_normal, keys[3], (d, d)),
        "bo": jnp.zeros((layers, d)),
        "ln2_scale": jnp.ones((layers, d)),
        "ln2_bias": jnp.zeros((layers, d)),
        "w1": stack(_trunc_normal, keys[4], (d, m)),
        "b1": jnp.zeros((layers, m)),
        "w2": stack(_trunc_normal, keys[5], (m, d)),
        "b2": jnp.zeros((layers, d)),
    }
    return {
        "patch_embed": {
            "kernel": _trunc_normal(keys[0], (patch_in, d)),
            "bias": jnp.zeros((d,)),
        },
        "cls_token": _trunc_normal(keys[6], (1, 1, d)),
        "pos_embed": _trunc_normal(keys[7], (1, cfg.seq_len, d)),
        "final_ln": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
        "blocks": blocks,
        # HF ViTModel carries a tanh pooler that the reference never uses
        # (features come from hidden_states, ssp_vit2spn_tiny.py:116) but
        # which IS counted by its count_parameters (:235-239) — with it, the
        # dual-stream trainable total is the published 11.68M. Kept inert for
        # introspection + checkpoint parity.
        "pooler": {
            "w": _trunc_normal(keys[8], (d, d)),
            "b": jnp.zeros((d,)),
        },
    }


def _layernorm(x: jax.Array, scale: jax.Array, bias: jax.Array, eps: float) -> jax.Array:
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale + bias).astype(dtype)


def patchify(x: jax.Array, patch: int) -> jax.Array:
    """(B, H, W, C) -> (B, N, patch*patch*C), flatten order (ph, pw, c)."""
    b, h, w, c = x.shape
    gh, gw = h // patch, w // patch
    x = x.reshape(b, gh, patch, gw, patch, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (B, gh, gw, ph, pw, c)
    return x.reshape(b, gh * gw, patch * patch * c)


def patchify_gray(x: jax.Array, patch: int) -> jax.Array:
    """(B, H, W) single-channel -> (B, N, patch*patch), flatten order (ph, pw)."""
    b, h, w = x.shape
    gh, gw = h // patch, w // patch
    x = x.reshape(b, gh, patch, gw, patch)
    x = x.transpose(0, 1, 3, 2, 4)  # (B, gh, gw, ph, pw)
    return x.reshape(b, gh * gw, patch * patch)


def fold_patch_embed_gray(patch_embed: dict, cfg: ViTConfig, norm_fold):
    """Collapse grayscale->3ch replication + per-channel normalization into
    the patch-embed weights (exact, by linearity):

        token_j = sum_{p,c} W[p,c,j] * (g_p - m_c)/s_c + b_j
                = sum_p (sum_c W[p,c,j]/s_c) * g_p
                  + (b_j - sum_{p,c} W[p,c,j] * m_c/s_c)

    so a (P*P, D) kernel over RAW grayscale patches replaces the (P*P*C, D)
    kernel over normalized replicated-RGB patches. norm_fold: (mean, std)
    per-channel tuples (the dataset Normalize stats, AugmentConfig). Returns
    (kernel_gray (P*P, D) fp32, bias_gray (D,) fp32)."""
    mean, std = norm_fold
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    pp = cfg.patch_size * cfg.patch_size
    w = patch_embed["kernel"].astype(jnp.float32).reshape(
        pp, cfg.num_channels, -1
    )  # flatten order (ph, pw, c) matches patchify
    kernel_g = jnp.einsum("pcd,c->pd", w, 1.0 / std)
    bias_g = patch_embed["bias"].astype(jnp.float32) - jnp.einsum(
        "pcd,c->d", w, mean / std
    )
    return kernel_g, bias_g


def _block(cfg: ViTConfig, attn_impl: Optional[str], x: jax.Array, p: dict) -> jax.Array:
    b, s, d = x.shape
    h, dh = cfg.num_heads, cfg.head_dim
    y = _layernorm(x, p["ln1_scale"], p["ln1_bias"], cfg.layernorm_eps)
    qkv = y @ p["wqkv"].astype(y.dtype) + p["bqkv"].astype(y.dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(b, s, h, dh)
    k = k.reshape(b, s, h, dh)
    v = v.reshape(b, s, h, dh)
    attn = multi_head_attention(q, k, v, impl=attn_impl).reshape(b, s, d)
    x = x + attn @ p["wo"].astype(attn.dtype) + p["bo"].astype(attn.dtype)

    y = _layernorm(x, p["ln2_scale"], p["ln2_bias"], cfg.layernorm_eps)
    y = y @ p["w1"].astype(y.dtype) + p["b1"].astype(y.dtype)
    y = jax.nn.gelu(y, approximate=False)  # HF ViT uses exact (erf) GELU
    y = y @ p["w2"].astype(y.dtype) + p["b2"].astype(y.dtype)
    return x + y


def vit_forward(
    params: dict,
    x: jax.Array,
    cfg: ViTConfig,
    policy: DTypePolicy = FP32,
    attn_impl: Optional[str] = None,
    remat: Optional[str] = None,
    norm_fold=None,
) -> dict:
    """Full forward. x: (B, H, W, C) float, already normalized — OR, with
    `norm_fold=(mean, std)`, a RAW grayscale (B, H, W) batch whose channel
    replication + normalization are folded into the patch-embed weights
    (fold_patch_embed_gray; exact up to float rounding).

    Returns {"pre_ln": (B, S, D), "last_hidden_state": (B, S, D)} where
    `pre_ln` matches HF `hidden_states[-1]` and `last_hidden_state` matches
    HF `last_hidden_state` (post final-layernorm).

    `remat` checkpoints each block under `lax.scan`: the backward pass
    recomputes block internals instead of stacking 12 layers of saved
    activations in HBM (without it, the (L, B, H, S, S) attention-probs
    residual alone is ~1.8 GB at microbatch 256).
    """
    x = x.astype(policy.compute_dtype)
    if x.ndim == 3:
        if norm_fold is None:
            raise ValueError(
                "grayscale (B, H, W) input requires norm_fold=(mean, std)"
            )
        kernel_g, bias_g = fold_patch_embed_gray(
            params["patch_embed"], cfg, norm_fold
        )
        tokens = (
            patchify_gray(x, cfg.patch_size)
            @ kernel_g.astype(policy.compute_dtype)
            + bias_g.astype(policy.compute_dtype)
        )
    else:
        kernel = params["patch_embed"]["kernel"].astype(policy.compute_dtype)
        bias = params["patch_embed"]["bias"].astype(policy.compute_dtype)
        tokens = patchify(x, cfg.patch_size) @ kernel + bias  # (B, N, D)

    b = tokens.shape[0]
    cls = jnp.broadcast_to(
        params["cls_token"].astype(policy.compute_dtype), (b, 1, cfg.hidden_size)
    )
    seq = jnp.concatenate([cls, tokens], axis=1)
    seq = seq + params["pos_embed"].astype(policy.compute_dtype)

    if attn_impl == "fused":
        # whole-BACKBONE fused Pallas kernel (TPU only): all layers in one
        # grid with the activation tile persistent in VMEM and per-layer
        # weights streamed — one launch per forward instead of one per layer
        # (ops/fused_block.py::fused_backbone). LN params stay fp32, matmul
        # weights in compute dtype.
        from vit2spn_tpu.ops.fused_block import WEIGHT_NAMES, fused_backbone

        wt = tuple(
            params["blocks"][n].astype(
                jnp.float32 if n.startswith("ln") else policy.compute_dtype
            )
            for n in WEIGHT_NAMES
        )
        # fwd tile 16 @ 40 MB scoped VMEM / per-layer bwd tile 4 — the
        # measured optimum on v5e (see ops/fused_block.py for the tile/VMEM
        # sweep history and measured dead ends)
        pre_ln = fused_backbone(seq, wt, cfg.num_heads, cfg.layernorm_eps)
        last_hidden = _layernorm(
            pre_ln,
            params["final_ln"]["scale"],
            params["final_ln"]["bias"],
            cfg.layernorm_eps,
        )
        return {"pre_ln": pre_ln, "last_hidden_state": last_hidden}
    if attn_impl == "fused_layer":
        # per-layer fused kernel under lax.scan (the round-1 formulation;
        # kept selectable for A/B)
        from vit2spn_tpu.ops.fused_block import WEIGHT_NAMES, fused_block

        def body(carry, layer_params):
            wt = tuple(
                layer_params[n].astype(
                    jnp.float32 if n.startswith("ln") else policy.compute_dtype
                )
                for n in WEIGHT_NAMES
            )
            out = fused_block(carry, wt, cfg.num_heads, cfg.layernorm_eps)
            return out, None
    else:
        block = functools.partial(_block, cfg, attn_impl)
        remat = remat if remat is not None else cfg.remat
        if remat == "full":
            block = jax.checkpoint(block)
        elif remat == "dots":
            block = jax.checkpoint(
                block, policy=jax.checkpoint_policies.dots_saveable
            )

        def body(carry, layer_params):
            lp = jax.tree.map(
                lambda a: a.astype(policy.compute_dtype), layer_params
            )
            return block(carry, lp), None

    pre_ln, _ = jax.lax.scan(body, seq, params["blocks"])
    last_hidden = _layernorm(
        pre_ln,
        params["final_ln"]["scale"],
        params["final_ln"]["bias"],
        cfg.layernorm_eps,
    )
    return {"pre_ln": pre_ln, "last_hidden_state": last_hidden}


def vit_features(
    params: dict,
    x: jax.Array,
    cfg: ViTConfig,
    policy: DTypePolicy = FP32,
    attn_impl: Optional[str] = None,
    norm_fold=None,
) -> jax.Array:
    """Backbone feature: mean over all tokens of hidden_states[-1]
    (ssp_vit2spn_tiny.py:116-117). Returns (B, D) in fp32."""
    out = vit_forward(params, x, cfg, policy, attn_impl, norm_fold=norm_fold)
    src = "last_hidden_state" if cfg.use_final_layernorm_features else "pre_ln"
    return jnp.mean(out[src].astype(jnp.float32), axis=1)


def count_params(tree) -> int:
    return sum(int(x.size) for x in jax.tree.leaves(tree))
