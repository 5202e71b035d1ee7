"""Self-supervised dual/single-stream networks (BYOL-style).

Reference semantics reproduced exactly (they define the published numbers):

  * DualStreamNetwork (ssp_vit2spn_tiny.py:121-166): four ViT backbones.
    online_1(view1), online_2(view2); frozen target_1(view1), target_2(view2).
    online features concat(384) -> projection_head -> prediction_head = pred;
    target features concat(384) -> the SAME trainable projection_head,
    stop-gradient = target (NOT an EMA projector — reference quirk, :158).
  * SingleStreamNetwork (dsn_ssn/ssp_single.py:103-138): one online/target
    pair; online(view1) vs target(view2); projection input 192; EMA momentum
    0.99 (:136).
  * EMA: target <- m * target + (1-m) * online, applied only on optimizer
    steps (every `accumulation_steps` microbatches, ssp_vit2spn_tiny.py:215-219).
    The reference's per-parameter Python loop (:163-166) becomes one fused
    `jax.tree.map` on device.
  * Loss: -mean(cosine_similarity(pred, target)) (ssp_vit2spn_tiny.py:211).

Init: with `pretrained_init`, all four backbones start from the same HF
checkpoint (identical); the scratch variant (ssp_ssl/ssl_vit2spn_scratch.py)
gives online and target networks INDEPENDENT random inits — both reproduced
via `init_dual_stream(..., identical_init=...)`.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from vit2spn_tpu.core.config import SSPConfig
from vit2spn_tpu.core.dtypes import DTypePolicy, FP32
from vit2spn_tpu.models.heads import init_mlp_head, mlp_head_apply
from vit2spn_tpu.models.vit import init_vit, vit_features


class DualStreamParams(NamedTuple):
    """Trainable params / frozen EMA targets are separate pytrees so the
    optimizer and grads only ever see `online` + heads."""

    online: dict  # {"net1": vit, "net2": vit} or {"net": vit} for single-stream
    heads: dict  # {"projection": ..., "prediction": ...}
    target: dict  # same structure as online; EMA copies, never differentiated


def init_dual_stream(
    key: jax.Array,
    cfg: SSPConfig,
    backbone_params: Optional[dict] = None,
) -> DualStreamParams:
    """If `backbone_params` given (e.g. converted HF checkpoint), every
    backbone starts from it (pretrained path). Otherwise each backbone gets an
    independent random init (scratch path, ssl_vit2spn_scratch.py)."""
    n_backbones = 4 if cfg.dual_stream else 2
    keys = jax.random.split(key, n_backbones + 2)

    def backbone(i):
        if backbone_params is not None:
            return jax.tree.map(jnp.copy, backbone_params)
        return init_vit(keys[i], cfg.vit)

    if cfg.dual_stream:
        online = {"net1": backbone(0), "net2": backbone(1)}
        target = {"net1": backbone(2), "net2": backbone(3)}
        proj_in = 2 * cfg.vit.hidden_size
    else:
        online = {"net": backbone(0)}
        target = {"net": backbone(1)}
        proj_in = cfg.vit.hidden_size

    heads = {
        "projection": init_mlp_head(keys[-2], (proj_in, cfg.proj_hidden, cfg.proj_dim)),
        "prediction": init_mlp_head(keys[-1], (cfg.proj_dim, cfg.proj_dim, cfg.proj_dim)),
    }
    return DualStreamParams(online=online, heads=heads, target=target)


def init_single_stream(key, cfg: SSPConfig, backbone_params=None) -> DualStreamParams:
    assert not cfg.dual_stream
    return init_dual_stream(key, cfg, backbone_params)


def _heads_forward(heads, fused, cfg, key, train, dtype):
    """projection(+dropout) -> prediction for the online path."""
    proj = mlp_head_apply(
        heads["projection"],
        fused.astype(dtype),
        dropout_rate=cfg.proj_dropout,
        dropout_after_layer=0,
        key=key,
        train=train,
    )
    pred = mlp_head_apply(heads["prediction"], proj)
    return pred


def dual_stream_forward(
    params: DualStreamParams,
    view1: jax.Array,
    view2: jax.Array,
    cfg: SSPConfig,
    policy: DTypePolicy = FP32,
    key: Optional[jax.Array] = None,
    train: bool = False,
    attn_impl: Optional[str] = None,
):
    """Returns (online_pred (B,128), target_proj (B,128)) — the exact tensors
    whose negative mean cosine similarity is the SSP loss."""
    dtype = policy.compute_dtype

    if cfg.dual_stream:
        f1 = vit_features(params.online["net1"], view1, cfg.vit, policy, attn_impl)
        f2 = vit_features(params.online["net2"], view2, cfg.vit, policy, attn_impl)
        online_fused = jnp.concatenate([f1, f2], axis=-1)
        t1 = vit_features(
            jax.lax.stop_gradient(params.target["net1"]), view1, cfg.vit, policy, attn_impl
        )
        t2 = vit_features(
            jax.lax.stop_gradient(params.target["net2"]), view2, cfg.vit, policy, attn_impl
        )
        target_fused = jnp.concatenate([t1, t2], axis=-1)
    else:
        # SingleStreamNetwork: online sees view1, target sees view2
        # (dsn_ssn/ssp_single.py:125-128).
        online_fused = vit_features(params.online["net"], view1, cfg.vit, policy, attn_impl)
        target_fused = vit_features(
            jax.lax.stop_gradient(params.target["net"]), view2, cfg.vit, policy, attn_impl
        )

    dropout_key = key if key is not None else jax.random.key(0)
    online_pred = _heads_forward(params.heads, online_fused, cfg, dropout_key, train, dtype)

    # Target path goes through the SAME trainable projection head, with
    # stop-gradient on the output (ssp_vit2spn_tiny.py:157-158). Dropout is
    # active on this path too in reference train mode (shared nn.Dropout).
    target_key = (
        jax.random.fold_in(dropout_key, 1) if key is not None else dropout_key
    )
    target_proj = mlp_head_apply(
        params.heads["projection"],
        target_fused.astype(dtype),
        dropout_rate=cfg.proj_dropout,
        dropout_after_layer=0,
        key=target_key,
        train=train,
    )
    return online_pred.astype(jnp.float32), jax.lax.stop_gradient(
        target_proj.astype(jnp.float32)
    )


single_stream_forward = dual_stream_forward  # same signature, cfg.dual_stream picks


def negative_cosine_loss(pred: jax.Array, target: jax.Array, eps: float = 1e-8):
    """-mean(cosine(pred, target)) — torch.nn.CosineSimilarity semantics
    (ssp_vit2spn_tiny.py:174,211)."""
    pn = pred / jnp.maximum(jnp.linalg.norm(pred, axis=-1, keepdims=True), eps)
    tn = target / jnp.maximum(jnp.linalg.norm(target, axis=-1, keepdims=True), eps)
    return -jnp.mean(jnp.sum(pn * tn, axis=-1))


def ema_update(target: dict, online: dict, momentum: float) -> dict:
    """target <- m*target + (1-m)*online, one fused tree.map
    (replaces the per-param Python loop at ssp_vit2spn_tiny.py:162-166)."""
    return jax.tree.map(
        lambda t, o: momentum * t + (1.0 - momentum) * o, target, online
    )
