"""Self-supervised pretraining trainer (C1/C2/C3).

TPU-native redesign of `train_self_supervised` (ssp_vit2spn_tiny.py:197-232):

  * ONE jitted train step per optimizer step. The reference's 8-microbatch
    gradient accumulation (:39,:215-219) becomes a `lax.scan` over microbatches
    inside the step — no host round-trips between microbatches.
  * Dual-view augmentation runs on device inside the same jitted step
    (vs 4 CPU dataloader workers, :101-107), per microbatch so peak memory
    stays at one augmented microbatch.
  * bf16 compute on the MXU replaces CUDA AMP + GradScaler (:175,209-217).
  * EMA target update is a fused tree.map applied once per optimizer step
    (matching :215-219, where update_target_network runs only when the
    optimizer steps).
  * Data parallelism: the step is jitted with the global batch sharded over
    the mesh's data axis and params replicated; XLA inserts the gradient
    all-reduce over ICI (GSPMD) — replacing the dead DDP/NCCL scaffold
    (:20-25).
  * Checkpoint every 10 epochs + resume (:198,231-232) and final
    backbone-only export of the stream-1 online network (:246).

Faithfulness notes: the reference's epoch has 762 batches, so its final
accumulation group is partial — 2 microbatches, the last with 69 samples
(:215 `or (i+1)==len(dataloader)`). With cfg.train_tail (default) that group
runs as ONE extra masked step: pad samples carry weight 0 in the weighted
cosine loss, so all 97,477 samples/epoch train under static shapes; with
train_tail=False the remainder is dropped (95 steps x 8 x 128 = 97,280).
Loss normalization matches: mean over microbatches == sum of
(loss/accum_steps), each microbatch mean taken over its REAL samples.
"""

from __future__ import annotations

import os
import time
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vit2spn_tpu.core.config import SSPConfig
from vit2spn_tpu.core.dtypes import DTypePolicy
from vit2spn_tpu.core import rng as rngmod
from vit2spn_tpu.data.augment import dual_view_batch
from vit2spn_tpu.data.datasets import Dataset
from vit2spn_tpu.models.ssp import (
    DualStreamParams,
    backbone_slice,
    dual_stream_forward,
    ema_update,
    init_dual_stream,
)
from jax.sharding import NamedSharding, PartitionSpec

from vit2spn_tpu.parallel.mesh import batch_sharding, make_mesh, replicated_sharding
from vit2spn_tpu.train import checkpoint as ckpt
from vit2spn_tpu.utils.logging import MetricLogger


class SSPTrainState(NamedTuple):
    params: DualStreamParams
    opt_state: optax.OptState
    step: jax.Array  # optimizer steps taken


class SSPTrainer:
    def __init__(
        self,
        cfg: SSPConfig,
        mesh=None,
        backbone_params: Optional[dict] = None,
        logger: Optional[MetricLogger] = None,
        attn_impl: Optional[str] = None,
        dist_mode: str = "gspmd",  # "gspmd" | "shard_map"
    ):
        self.cfg = cfg
        self.dist_mode = dist_mode
        self.policy = DTypePolicy.from_str(cfg.compute_dtype)
        self.mesh = mesh if mesh is not None else make_mesh(
            model_parallel=cfg.mesh.model_parallel,
            data_axis=cfg.mesh.data_axis,
            model_axis=cfg.mesh.model_axis,
        )
        # honor a renamed data axis (cfg or an externally-built mesh)
        self._data_axis = (
            cfg.mesh.data_axis
            if cfg.mesh.data_axis in self.mesh.axis_names
            else self.mesh.axis_names[0]
        )
        self.logger = logger or MetricLogger(echo=True)
        if attn_impl is None:
            from vit2spn_tpu.ops.attention import default_model_impl

            attn_impl = default_model_impl()
        elif attn_impl == "xla":
            # explicit XLA-attention request (None means "resolve default",
            # so it can't express this): the path TP>1 runs on, selectable
            # single-chip to measure the fused-kernel delta (bench --attn)
            attn_impl = None
        # tensor parallelism: Megatron-style param sharding over the model
        # axis (parallel/tp.py). The fused whole-block Pallas kernel is
        # DP-only, so TP runs dispatch to the XLA attention path.
        self._model_axis = (
            cfg.mesh.model_axis
            if cfg.mesh.model_axis in self.mesh.axis_names
            else None
        )
        self._tp = self.mesh.shape[self._model_axis] if self._model_axis else 1
        if self._tp > 1 and attn_impl == "fused":
            attn_impl = None
            self.logger.log(
                "info",
                message="tensor parallel > 1: using XLA attention "
                "(fused block kernel is DP-only)",
            )
        if self._tp > 1 and dist_mode == "shard_map":
            # Permanent, documented asymmetry (PARITY.md deviation 11): the
            # explicit-collective mode demonstrates the reference's DDP
            # (data-parallel) scaffold; TP is fully served by the GSPMD path
            # (parallel/tp.py). An explicit shard_map TP would need a
            # head-aligned qkv layout (the stored (d, 3d) q|k|v concat makes
            # per-shard slices cross q/k/v boundaries) for a configuration
            # measured to be academic here (TP forces XLA attention: 2.68x
            # slower than the fused DP kernel, VALIDATION.md).
            raise ValueError(
                "shard_map dist_mode is DP-only (permanent — PARITY.md "
                "deviation 11); use dist_mode='gspmd' for model_parallel>1"
            )
        self.attn_impl = attn_impl
        # Adam over trainable params only (targets are frozen; torch's
        # optimizer sees them but never receives grads, ssp_vit2spn_tiny.py:173)
        self.tx = optax.adam(cfg.learning_rate)

        key = rngmod.root_key(cfg.seed)
        # init_provenance records what the backbone init ACTUALLY was — the
        # parity runbook gates its verdict on this, because
        # _try_pretrained_backbone falls back to random SILENTLY (a corrupt
        # weight file must not let a run be judged against the published
        # ImageNet-init table, ssp_vit2spn_tiny.py:112).
        if backbone_params is not None:
            self.init_provenance = "explicit"
        elif cfg.pretrained_init:
            backbone_params = self._try_pretrained_backbone(key)
            self.init_provenance = (
                "pretrained" if backbone_params is not None
                else "random_fallback"
            )
        else:
            self.init_provenance = "random"
        # fit() updates these on checkpoint resume (the restored state
        # replaces the fresh init, so its recorded lineage wins)
        self.fit_resume_epoch = 0
        self.fit_resume_loss: Optional[float] = None
        params = init_dual_stream(key, cfg, backbone_params)
        opt_state = self.tx.init((params.online, params.heads))
        state = SSPTrainState(params, opt_state, jnp.zeros((), jnp.int32))

        self._rep = replicated_sharding(self.mesh)
        if self._tp > 1:
            from vit2spn_tpu.parallel.tp import tp_state_shardings

            self._state_sharding = tp_state_shardings(
                self.mesh, state, self._model_axis
            )
        else:
            self._state_sharding = self._rep
        self.state = jax.device_put(state, self._state_sharding)
        self._device_images = None
        self._staged_src = None  # host array currently staged (identity)
        self._extract_fns = {}  # (augment, features) -> jitted extractor
        self._step_fn, self._step_idx_fn, self._run_steps_fn = self._build_step()

    def _try_pretrained_backbone(self, key):
        """HF `WinKawaks/vit-tiny-patch16-224` init (ssp_vit2spn_tiny.py:112)
        when the checkpoint is available locally; falls back to random init
        with a warning (no network egress in this environment)."""
        try:
            from vit2spn_tpu.models.hf_convert import load_pretrained_vit_tiny

            return load_pretrained_vit_tiny(self.cfg.vit)
        except Exception as e:  # noqa: BLE001
            self.logger.log(
                "warning",
                message=f"pretrained ViT-Tiny unavailable ({type(e).__name__}); "
                "using random init",
            )
            return None

    # ------------------------------------------------------------------
    def attach_dataset(self, images: np.ndarray, max_bytes: int = 4 << 30):
        """Stage the full uint8 dataset in device HBM (OCTMNIST train is only
        76 MB). Steps then receive 4-byte indices instead of re-uploading the
        batch every step — host->device transfer drops out of the hot loop
        entirely (the tunnel transfer latency was ~20% of step time).

        Idempotent per source array: re-attaching the SAME array is free;
        a DIFFERENT array re-stages (so fit() on a new dataset can never
        silently train on a previously staged one)."""
        if self._staged_src is images:
            return True
        if images.nbytes > max_bytes:
            return False
        self._device_images = jax.device_put(
            jnp.asarray(images), replicated_sharding(self.mesh)
        )
        self._staged_src = images
        return True

    # ------------------------------------------------------------------
    def _build_step(self):
        cfg, policy, attn_impl = self.cfg, self.policy, self.attn_impl
        # raw-grayscale views + normalize folded into the patch embed
        # (models/vit.py::fold_patch_embed_gray): exact, and the
        # (B, 224, 224, 3) view tensors drop out of the hot loop
        norm_fold = (
            cfg.data.augment.normalize_mean,
            cfg.data.augment.normalize_std,
        )

        def loss_fn(trainable, target, v1, v2, key, w):
            """`w` is a per-sample 0/1 weight over the microbatch. All-ones
            reproduces the plain means exactly; the epoch's padded tail
            microbatches carry zeros on the pad (and all-zero weights on the
            group's unused microbatches), matching the reference's partial
            final accumulation group (ssp_vit2spn_tiny.py:215)."""
            online, heads = trainable
            params = DualStreamParams(online=online, heads=heads, target=target)
            pred, tgt = dual_stream_forward(
                params, v1, v2, cfg, policy, key=key, train=True,
                attn_impl=attn_impl, norm_fold=norm_fold,
            )
            pn = pred / jnp.maximum(
                jnp.linalg.norm(pred, axis=-1, keepdims=True), 1e-8
            )
            tn = tgt / jnp.maximum(
                jnp.linalg.norm(tgt, axis=-1, keepdims=True), 1e-8
            )
            denom = jnp.maximum(jnp.sum(w), 1.0)
            # weighted mean == negative_cosine_loss when w is all ones
            loss = -jnp.sum(jnp.sum(pn * tn, axis=-1) * w) / denom
            # Collapse diagnostic: std of the L2-normalized predictions
            # across the (weighted) batch. BYOL-style objectives can collapse
            # to constant features (loss -> -1 with pred_std -> 0) — observed
            # on low-diversity synthetic data with the reference's
            # shared-projection-head variant. The reference has no such
            # signal; the published runs rely on the real data's diversity.
            mean_w = jnp.sum(w[:, None] * pn, axis=0) / denom
            var = jnp.sum(w[:, None] * (pn - mean_w) ** 2, axis=0) / denom
            pred_std = jnp.mean(jnp.sqrt(var))
            return loss, pred_std

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

        def step(state: SSPTrainState, batch_u8: jax.Array, step_key: jax.Array,
                 w: jax.Array):
            # batch_u8: (accum * B, H, W, C) uint8, sharded over data axis;
            # w: (accum * B,) float32 per-sample weights (see loss_fn)
            a = cfg.accumulation_steps
            micro = batch_u8.reshape((a, -1) + batch_u8.shape[1:])
            wm = w.reshape(a, -1)
            keys = jax.random.split(step_key, a)

            trainable = (state.params.online, state.params.heads)
            zero_grads = jax.tree.map(jnp.zeros_like, trainable)

            def body(carry, inp):
                grads_acc, loss_acc, std_acc = carry
                mb, k, wv = inp
                k_aug, k_drop = jax.random.split(k)
                v1, v2 = dual_view_batch(
                    k_aug, mb, cfg.data.augment,
                    out_dtype=policy.compute_dtype, fold_normalize=True,
                )
                (loss, pred_std), grads = grad_fn(
                    trainable, state.params.target, v1, v2, k_drop, wv
                )
                grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
                return (grads_acc, loss_acc + loss, std_acc + pred_std), None

            (grads, loss_sum, std_sum), _ = jax.lax.scan(
                body, (zero_grads, jnp.zeros(()), jnp.zeros(())),
                (micro, keys, wm),
            )
            grads = jax.tree.map(lambda g: g / a, grads)

            updates, opt_state = self.tx.update(grads, state.opt_state, trainable)
            online, heads = optax.apply_updates(trainable, updates)
            target = ema_update(state.params.target, online, cfg.ema_momentum)
            new_params = DualStreamParams(online=online, heads=heads, target=target)
            metrics = {"loss": loss_sum / a, "pred_std": std_sum / a}
            return SSPTrainState(new_params, opt_state, state.step + 1), metrics

        if self.dist_mode == "shard_map":
            # explicit-collective formulation (parallel/shard_map_dp.py):
            # per-shard grad partial sums, normalized by the GLOBAL
            # per-microbatch weight sum (one scalar psum), then psum over
            # ICI -> replicated update. The global normalization makes the
            # weight-masked epoch tail (ssp_vit2spn_tiny.py:215) exact even
            # when shards hold different real-sample counts — identical
            # semantics to the GSPMD path.
            from vit2spn_tpu.parallel.shard_map_dp import shard_map_dp_step

            data_axis = self._data_axis

            def loss_sums(trainable, target, v1, v2, key, w):
                """UNNORMALIZED local partials: -(sum of w*cos) plus the
                weighted sums the caller combines into the global weighted
                mean / pred_std after psum (see local_grads)."""
                online, heads = trainable
                params = DualStreamParams(
                    online=online, heads=heads, target=target
                )
                pred, tgt = dual_stream_forward(
                    params, v1, v2, cfg, policy, key=key, train=True,
                    attn_impl=attn_impl, norm_fold=norm_fold,
                )
                pn = pred / jnp.maximum(
                    jnp.linalg.norm(pred, axis=-1, keepdims=True), 1e-8
                )
                tn = tgt / jnp.maximum(
                    jnp.linalg.norm(tgt, axis=-1, keepdims=True), 1e-8
                )
                num = -jnp.sum(jnp.sum(pn * tn, axis=-1) * w)
                s1 = jnp.sum(w[:, None] * pn, axis=0)
                s2 = jnp.sum(w[:, None] * pn * pn, axis=0)
                return num, (s1, s2)

            grad_sums = jax.value_and_grad(loss_sums, has_aux=True)

            def local_grads(state, micro, step_key, wm):
                # micro: (accum, B/n_shards, H, W) — this shard's slice of
                # every microbatch (pre-split in `step` below, so microbatch
                # composition matches the GSPMD path's global reshape)
                a = cfg.accumulation_steps
                keys = jax.random.split(step_key, a)
                trainable = (state.params.online, state.params.heads)
                zero = jax.tree.map(jnp.zeros_like, trainable)

                def body(carry, inp):
                    g_acc, l_acc, s_acc = carry
                    mb, k, wv = inp
                    k_aug, k_drop = jax.random.split(k)
                    v1, v2 = dual_view_batch(
                        k_aug, mb, cfg.data.augment,
                        out_dtype=policy.compute_dtype, fold_normalize=True,
                    )
                    (num, (s1, s2)), grads = grad_sums(
                        trainable, state.params.target, v1, v2, k_drop, wv
                    )
                    # ONE scalar psum makes the microbatch denominator
                    # global; grads stay local partials (outer psum adds
                    # them), loss/pred_std become shard-identical here
                    den = jnp.maximum(
                        jax.lax.psum(jnp.sum(wv), data_axis), 1.0
                    )
                    g_acc = jax.tree.map(
                        lambda acc, g: acc + g / den, g_acc, grads
                    )
                    loss = jax.lax.psum(num, data_axis) / den
                    mean_w = jax.lax.psum(s1, data_axis) / den
                    var = jnp.maximum(
                        jax.lax.psum(s2, data_axis) / den - mean_w**2, 0.0
                    )
                    pred_std = jnp.mean(jnp.sqrt(var))
                    return (g_acc, l_acc + loss, s_acc + pred_std), None

                (grads, loss_sum, std_sum), _ = jax.lax.scan(
                    body, (zero, jnp.zeros(()), jnp.zeros(())),
                    (micro, keys, wm),
                )
                return (
                    jax.tree.map(lambda g: g / a, grads),
                    {"loss": loss_sum / a, "pred_std": std_sum / a},
                )

            reduced = shard_map_dp_step(
                local_grads, self.mesh, self._data_axis, grad_reduce="psum",
                batch_dim=1,
            )

            def step(state, batch_u8, step_key, w):  # noqa: F811
                a = cfg.accumulation_steps
                micro = batch_u8.reshape((a, -1) + batch_u8.shape[1:])
                wm = w.reshape(a, -1)
                grads, metrics = reduced(state, micro, step_key, wm)
                trainable = (state.params.online, state.params.heads)
                updates, opt_state = self.tx.update(grads, state.opt_state, trainable)
                online, heads = optax.apply_updates(trainable, updates)
                target = ema_update(state.params.target, online, cfg.ema_momentum)
                return (
                    SSPTrainState(
                        DualStreamParams(online, heads, target),
                        opt_state,
                        state.step + 1,
                    ),
                    metrics,
                )

        data_shard = batch_sharding(self.mesh, 4, self._data_axis)
        w_shard = batch_sharding(self.mesh, 1, self._data_axis)
        st_shard = self._state_sharding
        step_jit = jax.jit(
            step,
            in_shardings=(st_shard, data_shard, self._rep, w_shard),
            out_shardings=(st_shard, self._rep),
            donate_argnums=(0,),
        )

        def step_by_index(state, images, idx, step_key, w):
            batch = jnp.take(images, idx, axis=0)
            return step(state, batch, step_key, w)

        idx_shard = batch_sharding(self.mesh, 1, self._data_axis)
        step_idx_jit = jax.jit(
            step_by_index,
            in_shardings=(st_shard, self._rep, idx_shard, self._rep, w_shard),
            out_shardings=(st_shard, self._rep),
            donate_argnums=(0,),
        )

        # Whole-epoch driver: scan over optimizer steps so ONE dispatch (and
        # one ~40 ms host<->device round-trip on the tunneled runtime) covers
        # the entire epoch instead of every step.
        def run_steps(state, images, idx_mat, keys, w_mat):
            def body(st, inp):
                idx, k, w = inp
                batch = jnp.take(images, idx, axis=0)
                return step(st, batch, k, w)

            return jax.lax.scan(body, state, (idx_mat, keys, w_mat))

        idx2_shard = NamedSharding(
            self.mesh, PartitionSpec(None, self._data_axis)
        )
        run_steps_jit = jax.jit(
            run_steps,
            in_shardings=(st_shard, self._rep, idx2_shard, self._rep,
                          idx2_shard),
            out_shardings=(st_shard, self._rep),
            donate_argnums=(0,),
        )
        return step_jit, step_idx_jit, run_steps_jit

    # ------------------------------------------------------------------
    def train_step(self, batch_u8: np.ndarray, step_key, w=None) -> dict:
        """Dispatches one optimizer step; returns DEVICE-array metrics
        {"loss", "pred_std"}. Callers must not fetch them per step (that
        serializes host and device; fetch once per epoch — the async
        dispatch queue then hides all host work behind device compute).
        `w` (optional, (accum*B,) 0/1) masks padded tail samples."""
        batch = jax.device_put(
            jnp.asarray(batch_u8), batch_sharding(self.mesh, 4, self._data_axis)
        )
        w = self._weights(len(batch_u8), w)
        self.state, metrics = self._step_fn(self.state, batch, step_key, w)
        return metrics

    def _weights(self, n: int, w) -> jax.Array:
        arr = np.ones(n, np.float32) if w is None else np.asarray(w, np.float32)
        return jax.device_put(
            jnp.asarray(arr), batch_sharding(self.mesh, 1, self._data_axis)
        )

    def train_step_indices(self, idx: np.ndarray, step_key, w=None) -> jax.Array:
        """Step over device-resident data (see attach_dataset): only the
        index vector crosses the host->device boundary."""
        assert self._device_images is not None, "call attach_dataset first"
        idx_dev = jax.device_put(
            jnp.asarray(idx, jnp.int32),
            batch_sharding(self.mesh, 1, self._data_axis),
        )
        self.state, metrics = self._step_idx_fn(
            self.state, self._device_images, idx_dev, step_key,
            self._weights(len(idx), w),
        )
        return metrics

    def train_epoch(self, idx_mat: np.ndarray, keys: jax.Array,
                    w_mat: Optional[np.ndarray] = None) -> jax.Array:
        """Run idx_mat.shape[0] optimizer steps in ONE jitted scan over the
        device-resident dataset. Returns the per-step losses (device array).
        `w_mat` (optional, same shape as idx_mat, 0/1) masks padded tail
        samples (both dist modes normalize by the global weight sum)."""
        assert self._device_images is not None, "call attach_dataset first"
        sh2 = NamedSharding(self.mesh, PartitionSpec(None, self._data_axis))
        idx_dev = jax.device_put(jnp.asarray(idx_mat, jnp.int32), sh2)
        if w_mat is None:
            w_mat = np.ones(idx_mat.shape, np.float32)
        w_dev = jax.device_put(jnp.asarray(w_mat, jnp.float32), sh2)
        self.state, metrics = self._run_steps_fn(
            self.state, self._device_images, idx_dev, keys, w_dev
        )
        return metrics  # dict of per-step arrays

    def fit(
        self,
        dataset: Dataset,
        epochs: Optional[int] = None,
        checkpoint_path: Optional[str] = None,
        steps_per_epoch: Optional[int] = None,
    ):
        """Full pretraining loop with resume + periodic checkpoints."""
        cfg = self.cfg
        epochs = epochs if epochs is not None else cfg.epochs
        eff = cfg.effective_batch
        n = len(dataset)
        spe = steps_per_epoch if steps_per_epoch is not None else n // eff
        if spe < 1:
            raise ValueError(f"dataset of {n} too small for effective batch {eff}")
        # partial final accumulation group (ssp_vit2spn_tiny.py:215): one
        # extra step whose pad indices carry weight 0
        rem = n - spe * eff if steps_per_epoch is None else 0
        use_tail = cfg.train_tail and rem > 0
        n_trained = spe * eff + (rem if use_tail else 0)

        start_epoch = 0
        self.fit_resume_loss = None
        if checkpoint_path and ckpt.exists(checkpoint_path):
            meta = ckpt.metadata(checkpoint_path)
            self.state = jax.device_put(
                ckpt.restore(checkpoint_path, self.state), self._state_sharding
            )
            start_epoch = int(meta.get("epoch", 0))
            # the restored state REPLACES whatever init this trainer was
            # constructed with, so the checkpoint's recorded lineage wins —
            # the parity runbook gates its verdict on init_provenance, and a
            # random-lineage checkpoint must not ride a later pretrained
            # construction to a PASS. Pre-field checkpoints can't prove
            # theirs: "resume_unverified" (never judged as pretrained).
            self.init_provenance = str(
                meta.get("init_provenance", "resume_unverified")
            )
            if meta.get("loss") is not None:
                self.fit_resume_loss = float(meta["loss"])
            self.logger.log(
                "resume", epoch=start_epoch, loss=meta.get("loss", float("nan"))
            )
        self.fit_resume_epoch = start_epoch

        from vit2spn_tpu.data import native

        key = rngmod.root_key(cfg.seed)
        # attach_dataset is identity-cached: same array -> no-op, different
        # array -> re-stage (never silently trains on a stale staged dataset)
        on_device = self.attach_dataset(dataset.images)
        history = []
        for epoch in range(start_epoch, epochs):
            # Native host data-plane (data/native.py): seeded Fisher-Yates
            # permutation + threaded batch gather. Epoch order is
            # deterministic given the seed; the numpy fallback draws a
            # different (equally uniform) order — sample order is not part
            # of the published protocol (the reference's comes from torch's
            # RandomSampler, which matches neither).
            perm = native.shuffled_indices(n, cfg.seed + epoch)
            t0 = time.perf_counter()
            idx_mat = perm[: spe * eff].reshape(spe, eff)
            w_mat = None
            if use_tail:
                # pad the tail row to a full group with weight-0 repeats
                tail_idx = np.concatenate([perm[spe * eff:], perm[: eff - rem]])
                idx_mat = np.concatenate([idx_mat, tail_idx[None]], axis=0)
                w_mat = np.ones(idx_mat.shape, np.float32)
                w_mat[-1, rem:] = 0.0
            n_steps = idx_mat.shape[0]
            if on_device:
                keys = jax.vmap(
                    lambda s: rngmod.fold(key, epoch, s)
                )(jnp.arange(n_steps))
                metrics = self.train_epoch(idx_mat, keys, w_mat)
            else:
                # dataset too large for HBM staging: batches are assembled on
                # host by the threaded native gather and shipped per step
                steps = []
                for s in range(n_steps):
                    step_key = rngmod.fold(key, epoch, s)
                    batch = native.gather_batch(dataset.images, idx_mat[s])
                    steps.append(self.train_step(
                        batch, step_key,
                        None if w_mat is None else w_mat[s],
                    ))
                metrics = jax.tree.map(lambda *xs: jnp.stack(xs), *steps)
            # the epoch's only host sync. Per-step metrics average over the
            # nominal `a` microbatches (the tail step's dead microbatches
            # contribute zeros), so the epoch mean re-weights by the REAL
            # microbatch count — matching the reference's mean over
            # len(dataloader) batches (ssp_vit2spn_tiny.py:227-228).
            a = cfg.accumulation_steps
            n_micro = spe * a + (-(-rem // cfg.batch_size) if use_tail else 0)
            avg = float(jnp.sum(metrics["loss"])) * a / n_micro
            pred_std = float(jnp.sum(metrics["pred_std"])) * a / n_micro
            dt = time.perf_counter() - t0
            history.append(avg)
            self.logger.log(
                "ssp_epoch",
                epoch=epoch + 1,
                loss=avg,
                pred_std=pred_std,  # -> 0 signals representational collapse
                images_per_sec=n_trained / dt,
                seconds=dt,
            )
            if checkpoint_path and (epoch + 1) % cfg.checkpoint_every_epochs == 0:
                ckpt.save(
                    checkpoint_path,
                    jax.device_get(self.state),
                    # init_provenance + dataset_name + dataset_synthetic =
                    # the checkpoint's full lineage; the parity runbook
                    # refuses to resume a checkpoint trained on different
                    # data (a --smoke run's synthetic-trained epochs must not
                    # count into a real run's verdict, evals/parity.py). The
                    # explicit synthetic flag matters because the loaders'
                    # silent fallback reuses the real dataset's NAME.
                    {"epoch": epoch + 1, "loss": avg,
                     "init_provenance": self.init_provenance,
                     "dataset_name": getattr(dataset, "name", None),
                     "dataset_synthetic": bool(
                         getattr(dataset, "synthetic", False))},
                )
                self.logger.log("checkpoint", epoch=epoch + 1, path=checkpoint_path)
        return history

    def extract_features(
        self,
        dataset: Dataset,
        batch_size: int = 256,
        augment: bool = False,
        features: str = "pred",
    ):
        """Online-network features for downstream probing.

        Parity target: `extract_online_features` (dsn_ssn/ssp_single.py:
        140-156) collects `model(view1, view2)[0]` in eval mode — the online
        PREDICTION-head output (B, proj_dim=128). `features="pred"` (default)
        reproduces exactly that. `features="backbone"` returns the
        concatenated raw backbone features (B, n_streams*D) instead — a
        framework extension for linear probing, NOT reference parity.

        Returns (features fp32, labels). Deterministic resize views by
        default; `augment=True` reproduces the reference's augmented
        dual-view loader."""
        import dataclasses as _dc

        from vit2spn_tpu.models.ssp import _batched_features

        cfg, policy = self.cfg, self.policy
        aug_cfg = cfg.data.augment if augment else _dc.replace(
            cfg.data.augment, enabled=False
        )

        # memoize per (augment, features): a fresh @jax.jit closure per call
        # would recompile the full model every invocation (3-8 min per
        # compile on the tunneled TPU runtime)
        feats_fn = self._extract_fns.get((augment, features))
        if feats_fn is None:
            @jax.jit
            def feats_fn(params, batch_u8, key):
                v1, v2 = dual_view_batch(key, batch_u8, aug_cfg,
                                         out_dtype=policy.compute_dtype)
                if features == "pred":
                    pred, _ = dual_stream_forward(
                        params, v1, v2, cfg, policy, train=False,
                        attn_impl=self.attn_impl,
                    )
                    return pred
                views = jnp.stack([v1, v2]) if cfg.dual_stream else v1[None]
                f = _batched_features(params.online, views, cfg, policy,
                                      self.attn_impl)
                return f.transpose(1, 0, 2).reshape(batch_u8.shape[0], -1)

            self._extract_fns[(augment, features)] = feats_fn

        feats = []
        n = len(dataset)
        for s in range(0, n, batch_size):
            chunk = dataset.images[s : s + batch_size]
            pad = batch_size - len(chunk)
            if pad:
                chunk = np.concatenate([chunk, np.repeat(chunk[:1], pad, 0)])
            key = rngmod.fold(rngmod.root_key(cfg.seed), 31337, s)
            out = feats_fn(self.state.params, jnp.asarray(chunk), key)
            feats.append(np.asarray(out)[: batch_size - pad or batch_size])
        return np.concatenate(feats)[:n], np.asarray(dataset.labels)

    def export_backbone(self, path: Optional[str] = None) -> str:
        """Final artifact: the stream-1 online backbone only
        (ssp_vit2spn_tiny.py:246) — the inter-script API every fine-tune
        consumes."""
        cfg = self.cfg
        path = path or os.path.join(cfg.checkpoint_dir, cfg.export_name + ".npz")
        backbone = jax.device_get(backbone_slice(self.state.params.online, 0))
        ckpt.save(path, backbone, {"format": "vit_backbone", "source": cfg.export_name})
        self.logger.log("export", path=path)
        return path
