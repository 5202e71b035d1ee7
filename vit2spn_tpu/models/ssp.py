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

TPU-native layout: the online pair and the target pair are each stored as ONE
stacked pytree (leading net axis of size 2, or 1 for single-stream) and run
through a single vmapped backbone forward. Every GEMM in the transformer then
carries a batch dimension over nets — half the kernel launches / fusions of
four separate forwards, which measurably matters at ViT-Tiny size where
per-op overhead rivals compute.

Init: with `backbone_params` given (e.g. the converted HF checkpoint) all
nets start identical (pretrained path); otherwise each net gets an
independent random init — reproducing the scratch variant's independent
online/target inits (ssp_ssl/ssl_vit2spn_scratch.py).
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
    optimizer and grads only ever see `online` + `heads`.

    `online` / `target`: stacked backbone pytrees with a leading net axis —
    (2, ...) per leaf for dual-stream (net 0 = stream 1), (1, ...) for
    single-stream."""

    online: dict
    heads: dict
    target: dict


def num_streams(cfg: SSPConfig) -> int:
    return 2 if cfg.dual_stream else 1


def init_dual_stream(
    key: jax.Array,
    cfg: SSPConfig,
    backbone_params: Optional[dict] = None,
) -> DualStreamParams:
    n = num_streams(cfg)
    keys = jax.random.split(key, 2 * n + 2)

    def stack(ks):
        if backbone_params is not None:
            return jax.tree.map(
                lambda a: jnp.stack([jnp.asarray(a)] * n), backbone_params
            )
        nets = [init_vit(k, cfg.vit) for k in ks]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *nets)

    online = stack(keys[:n])
    target = stack(keys[n : 2 * n])
    proj_in = n * cfg.vit.hidden_size

    heads = {
        "projection": init_mlp_head(keys[-2], (proj_in, cfg.proj_hidden, cfg.proj_dim)),
        "prediction": init_mlp_head(keys[-1], (cfg.proj_dim, cfg.proj_dim, cfg.proj_dim)),
    }
    return DualStreamParams(online=online, heads=heads, target=target)


def init_single_stream(key, cfg: SSPConfig, backbone_params=None) -> DualStreamParams:
    assert not cfg.dual_stream
    return init_dual_stream(key, cfg, backbone_params)


def backbone_slice(stacked: dict, i: int = 0) -> dict:
    """Extract net i from a stacked backbone pytree (the export contract is
    the STREAM-1 online backbone, ssp_vit2spn_tiny.py:246)."""
    return jax.tree.map(lambda a: a[i], stacked)


def _batched_features(stacked_params, views, cfg, policy, attn_impl,
                      norm_fold=None):
    """views: (n, B, H, W, C) — or (n, B, H, W) grayscale with norm_fold —
    through n stacked nets -> (n, B, D).

    Runs the n nets as separate forwards over sliced params rather than one
    vmapped batch-n forward: measured on v5e, batch-2 GEMMs run ~8% slower
    than two separate GEMM streams at ViT-Tiny size (the params stay stored
    stacked for the EMA tree.map and export contract)."""
    n = views.shape[0]
    feats = [
        vit_features(backbone_slice(stacked_params, i), views[i], cfg.vit,
                     policy, attn_impl, norm_fold=norm_fold)
        for i in range(n)
    ]
    return jnp.stack(feats)


def dual_stream_forward(
    params: DualStreamParams,
    view1: jax.Array,
    view2: jax.Array,
    cfg: SSPConfig,
    policy: DTypePolicy = FP32,
    key: Optional[jax.Array] = None,
    train: bool = False,
    attn_impl: Optional[str] = None,
    norm_fold=None,
):
    """Returns (online_pred (B,128), target_proj (B,128)) — the exact tensors
    whose negative mean cosine similarity is the SSP loss. Views may be raw
    grayscale (B, H, W) when norm_fold=(mean, std) is given (the normalize
    folds into the patch embed, models/vit.py::fold_patch_embed_gray)."""
    dtype = policy.compute_dtype
    b = view1.shape[0]

    if cfg.dual_stream:
        views_online = jnp.stack([view1, view2])  # net i sees view i
        views_target = views_online
    else:
        # SingleStreamNetwork: online sees view1, target sees view2
        # (dsn_ssn/ssp_single.py:125-128).
        views_online = view1[None]
        views_target = view2[None]

    f_online = _batched_features(
        params.online, views_online, cfg, policy, attn_impl, norm_fold
    )
    f_target = _batched_features(
        jax.lax.stop_gradient(params.target), views_target, cfg, policy,
        attn_impl, norm_fold,
    )
    # concat over streams == (n, B, D) -> (B, n*D)
    online_fused = f_online.transpose(1, 0, 2).reshape(b, -1)
    target_fused = f_target.transpose(1, 0, 2).reshape(b, -1)

    if train and key is None and cfg.proj_dropout > 0:
        # a silent fixed key would reuse ONE dropout mask across every step
        # AND share it between the online and target passes — degenerate
        # training the caller would never notice
        raise ValueError(
            "dual_stream_forward(train=True) with proj_dropout > 0 "
            "requires an explicit `key`"
        )
    dropout_key = key if key is not None else jax.random.key(0)
    proj = mlp_head_apply(
        params.heads["projection"],
        online_fused.astype(dtype),
        dropout_rate=cfg.proj_dropout,
        dropout_after_layer=0,
        key=dropout_key,
        train=train,
    )
    online_pred = mlp_head_apply(params.heads["prediction"], proj)

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
    """target <- m*target + (1-m)*online, one fused tree.map over the stacked
    pytrees (replaces the per-param Python loop at ssp_vit2spn_tiny.py:162-166)."""
    return jax.tree.map(
        lambda t, o: momentum * t + (1.0 - momentum) * o, target, online
    )
