"""Fine-tuning trainer (C4-C8).

Reproduces `fine_tune_model` + per-fold setup (octmnist_ft_vit2spn.py:90-126,
176-202) as jitted TPU steps:

  * FineTunedModel: full backbone fine-tuned (no freezing) + fc head
    Linear(192->128) BN ReLU Dropout(.5) Linear(128->classes) (:73-87).
  * Weighted CrossEntropyLoss with sklearn balanced class weights (:185-187);
    torch semantics: mean weighted by the per-sample class weight.
  * torch.optim.Adam(lr=1e-4, weight_decay=1e-4) — note torch Adam's
    weight_decay is L2-into-gradient (not AdamW) (:192).
  * ReduceLROnPlateau on val loss + early stop patience 3 + best-weight
    restore (:90-126,193). The lr scale enters the jitted step as a traced
    scalar (no recompile on plateau drops).
  * The reference applies the SAME strong augmentation at train, val and test
    time (:49-50 — one transform for all splits). Faithful by default
    (`eval_augment=True` with a fixed eval key); deterministic eval available
    as a documented deviation.
  * BatchNorm batch stats reduce over the GLOBAL sharded batch under GSPMD
    (= SyncBatchNorm, ssp_vit2spn_tiny.py:171).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vit2spn_tpu.core.config import FineTuneConfig
from vit2spn_tpu.core.dtypes import DTypePolicy
from vit2spn_tpu.core import rng as rngmod
from vit2spn_tpu.data.augment import augment_batch
from vit2spn_tpu.data.datasets import Dataset
from vit2spn_tpu.models.heads import (
    classifier_head_apply,
    init_bn_state,
    init_classifier_head,
)
from vit2spn_tpu.models.vit import init_vit, vit_features
from vit2spn_tpu.parallel.mesh import batch_sharding, make_mesh, replicated_sharding
from vit2spn_tpu.train.optim import EarlyStopping, ReduceLROnPlateau
from vit2spn_tpu.utils.logging import MetricLogger


class FineTuneState(NamedTuple):
    backbone: dict
    head: dict
    bn_state: dict
    opt_state: optax.OptState


def weighted_cross_entropy(logits, labels, class_weights):
    """torch.nn.CrossEntropyLoss(weight=w) semantics:
    sum_i w[y_i] * nll_i / sum_i w[y_i]."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    w = class_weights[labels]
    return jnp.sum(w * nll) / jnp.maximum(jnp.sum(w), 1e-12)


class FineTuneTrainer:
    def __init__(
        self,
        cfg: FineTuneConfig,
        num_classes: int,
        backbone_params: Optional[dict] = None,
        mesh=None,
        logger: Optional[MetricLogger] = None,
        fold: int = 0,
        attn_impl: Optional[str] = None,
        eval_augment: bool = True,
    ):
        self.cfg = cfg
        self.num_classes = num_classes
        self.policy = DTypePolicy.from_str(cfg.compute_dtype)
        self.mesh = mesh if mesh is not None else make_mesh(
            model_parallel=cfg.mesh.model_parallel
        )
        self.logger = logger or MetricLogger(echo=True)
        self.attn_impl = attn_impl
        self.eval_augment = eval_augment

        key = rngmod.fold(rngmod.root_key(cfg.seed), fold)
        bk, hk = jax.random.split(key)
        backbone = (
            jax.tree.map(jnp.asarray, backbone_params)
            if backbone_params is not None
            else init_vit(bk, cfg.vit)
        )
        head = init_classifier_head(
            hk, cfg.vit.hidden_size, cfg.head_hidden, num_classes
        )
        # L2-into-gradient + Adam, matching torch.optim.Adam(weight_decay=...)
        self.tx = optax.chain(
            optax.add_decayed_weights(cfg.weight_decay),
            optax.scale_by_adam(),
        )
        opt_state = self.tx.init((backbone, head))
        state = FineTuneState(backbone, head, init_bn_state(cfg.head_hidden), opt_state)

        self._rep = replicated_sharding(self.mesh)
        self.state = jax.device_put(state, self._rep)
        self._train_key = rngmod.fold(rngmod.root_key(cfg.seed), 7919, fold)
        self._train_step, self._eval_step = self._build_steps()

    # ------------------------------------------------------------------
    def _build_steps(self):
        cfg, policy, attn_impl = self.cfg, self.policy, self.attn_impl
        base_lr = cfg.learning_rate

        def forward(backbone, head, bn_state, images, key, train):
            feats = vit_features(backbone, images, cfg.vit, policy, attn_impl)
            return classifier_head_apply(
                head,
                bn_state,
                feats.astype(policy.compute_dtype),
                dropout_rate=cfg.head_dropout,
                key=key,
                train=train,
            )

        def loss_fn(trainable, bn_state, images, labels, weights, key):
            backbone, head = trainable
            logits, new_bn = forward(backbone, head, bn_state, images, key, True)
            return weighted_cross_entropy(logits, labels, weights), new_bn

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

        def train_step(state: FineTuneState, batch_u8, labels, weights, key, lr_scale):
            k_aug, k_drop = jax.random.split(key)
            images = augment_batch(
                k_aug, batch_u8, cfg.data.augment, out_dtype=policy.compute_dtype
            )
            trainable = (state.backbone, state.head)
            (loss, new_bn), grads = grad_fn(
                trainable, state.bn_state, images, labels, weights, k_drop
            )
            updates, opt_state = self.tx.update(grads, state.opt_state, trainable)
            lr = base_lr * lr_scale
            backbone, head = jax.tree.map(
                lambda p, u: p - lr * u, trainable, updates
            )
            return FineTuneState(backbone, head, new_bn, opt_state), loss

        # The reference evaluates through the same random strong-augment
        # transform (octmnist_ft_vit2spn.py:49-50). eval_augment=False gives
        # deterministic resize+normalize instead (documented deviation).
        eval_aug_cfg = (
            cfg.data.augment
            if self.eval_augment
            else dataclasses.replace(cfg.data.augment, enabled=False)
        )

        def eval_step(state: FineTuneState, batch_u8, labels, weights, key):
            images = augment_batch(
                key, batch_u8, eval_aug_cfg, out_dtype=policy.compute_dtype
            )
            logits, _ = forward(
                state.backbone, state.head, state.bn_state, images, key, False
            )
            loss = weighted_cross_entropy(logits, labels, weights)
            probs = jax.nn.softmax(logits, axis=-1)
            return loss, probs

        data4 = batch_sharding(self.mesh, 4)
        data1 = batch_sharding(self.mesh, 1)
        rep = self._rep
        train_jit = jax.jit(
            train_step,
            in_shardings=(rep, data4, data1, rep, rep, rep),
            out_shardings=(rep, rep),
            donate_argnums=(0,),
        )
        eval_jit = jax.jit(
            eval_step,
            in_shardings=(rep, data4, data1, rep, rep),
            out_shardings=(rep, rep),
        )
        return train_jit, eval_jit

    # ------------------------------------------------------------------
    def _batches(self, ds: Dataset, batch_size: int, shuffle: bool,
                 drop_last: bool, seed: int):
        n = len(ds)
        idx = (
            np.random.default_rng(seed).permutation(n) if shuffle else np.arange(n)
        )
        stop = (n // batch_size) * batch_size if drop_last else n
        for s in range(0, stop, batch_size):
            sel = idx[s : s + batch_size]
            if len(sel) < batch_size and drop_last:
                break
            yield ds.images[sel], ds.labels[sel]

    def _pad(self, imgs, labs, batch_size):
        """Pad the last partial batch to a static shape; returns pad mask."""
        k = len(labs)
        if k == batch_size:
            return imgs, labs, np.ones(k, bool)
        pad = batch_size - k
        imgs = np.concatenate([imgs, np.repeat(imgs[:1], pad, axis=0)])
        labs = np.concatenate([labs, np.repeat(labs[:1], pad)])
        mask = np.concatenate([np.ones(k, bool), np.zeros(pad, bool)])
        return imgs, labs, mask

    def evaluate(self, ds: Dataset, class_weights: np.ndarray, seed: int = 0):
        """Returns (mean loss, probs (N, C), labels (N,))."""
        bs = self.cfg.batch_size
        weights = jnp.asarray(class_weights)
        losses, probs_all, labels_all = [], [], []
        for bi, (imgs, labs) in enumerate(
            self._batches(ds, bs, shuffle=False, drop_last=False, seed=0)
        ):
            imgs_p, labs_p, mask = self._pad(imgs, labs, bs)
            key = rngmod.fold(rngmod.root_key(self.cfg.seed), 104729, seed, bi)
            loss, probs = self._eval_step(
                self.state, jnp.asarray(imgs_p), jnp.asarray(labs_p), weights, key
            )
            losses.append(float(loss))
            probs_all.append(np.asarray(probs)[mask])
            labels_all.append(labs)
        return (
            float(np.mean(losses)),
            np.concatenate(probs_all),
            np.concatenate(labels_all),
        )

    def fit(
        self,
        train_ds: Dataset,
        val_ds: Dataset,
        class_weights: np.ndarray,
        epochs: Optional[int] = None,
        tag: str = "ft",
    ):
        """Epoch loop with scheduler/early-stop/best-restore
        (octmnist_ft_vit2spn.py:90-126)."""
        cfg = self.cfg
        epochs = epochs if epochs is not None else cfg.epochs
        weights = jnp.asarray(class_weights)
        plateau = ReduceLROnPlateau(
            factor=cfg.plateau_factor, patience=cfg.plateau_patience
        )
        stopper = EarlyStopping(patience=cfg.early_stop_patience)
        lr_scale = 1.0

        for epoch in range(epochs):
            train_losses = []
            for bi, (imgs, labs) in enumerate(
                self._batches(
                    train_ds, cfg.batch_size, shuffle=True, drop_last=True,
                    seed=cfg.seed + epoch,
                )
            ):
                key = rngmod.fold(self._train_key, epoch, bi)
                self.state, loss = self._train_step(
                    self.state,
                    jnp.asarray(imgs),
                    jnp.asarray(labs),
                    weights,
                    key,
                    jnp.asarray(lr_scale, jnp.float32),
                )
                train_losses.append(float(loss))

            val_loss, _, _ = self.evaluate(val_ds, class_weights, seed=epoch)
            if cfg.use_scheduler:
                lr_scale = plateau.step(val_loss)
            self.logger.log(
                f"{tag}_epoch",
                epoch=epoch + 1,
                train_loss=float(np.mean(train_losses)) if train_losses else float("nan"),
                val_loss=val_loss,
                lr_scale=lr_scale,
            )
            if cfg.use_early_stop:
                if stopper.step(val_loss, jax.device_get(self.state)):
                    break
            else:
                stopper.step(val_loss, jax.device_get(self.state))

        if stopper.best_state is not None:  # restore best weights (:126)
            self.state = jax.device_put(stopper.best_state, self._rep)
        return stopper.best
