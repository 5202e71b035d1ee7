"""Cross-framework TRAINING-trajectory parity vs the reference's semantics.

The reference's training loop (ssp_vit2spn_tiny.py:121-232) is re-implemented
here in torch from its spec — HF `ViTModel` backbones, the shared trainable
projection head with a detached target path (:153-158), negative-mean-cosine
loss with /accumulation_steps scaling (:211), `torch.optim.Adam` (:173), EMA
on optimizer steps only (:215-219) — and run on IDENTICAL inputs and initial
weights as our jitted SSP train step (train/ssp.py). Matching per-step losses
and post-training parameters validates the whole integration surface that
forward-only parity tests cannot: gradient flow through the stop-gradient
target, accumulation normalization, optax-vs-torch Adam numerics (bias
correction, eps placement), and the EMA ordering.

Stochastic pieces that cannot be matched bitwise across frameworks are
disabled for the comparison: augmentation off (deterministic views; the aug
distributions are covered by tests/test_augment_pil_parity.py) and
proj_dropout=0 (dropout masks are RNG-scheme-specific; the dropout math is
covered by tests/test_models.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from vit2spn_tpu.core.config import (  # noqa: E402
    AugmentConfig,
    DataConfig,
    SSPConfig,
    ViTConfig,
)
from vit2spn_tpu.models.hf_convert import convert_to_hf_state_dict  # noqa: E402
from vit2spn_tpu.models.ssp import backbone_slice  # noqa: E402

N_STEPS = 3


def _cfg() -> SSPConfig:
    return SSPConfig(
        vit=ViTConfig(image_size=32, patch_size=16, hidden_size=32,
                      num_layers=2, num_heads=2, mlp_dim=64),
        data=DataConfig(name="synthetic",
                        augment=AugmentConfig(out_size=32, enabled=False)),
        batch_size=4,
        accumulation_steps=2,
        pretrained_init=False,  # independent random inits for all 4 nets
        compute_dtype="float32",
        proj_hidden=64,
        proj_dim=32,
        proj_dropout=0.0,  # see module docstring
        ema_momentum=0.99,
    )


def _hf_vit_config(cfg: ViTConfig) -> "transformers.ViTConfig":
    return transformers.ViTConfig(
        image_size=cfg.image_size, patch_size=cfg.patch_size,
        hidden_size=cfg.hidden_size, num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads, intermediate_size=cfg.mlp_dim,
        layer_norm_eps=cfg.layernorm_eps,
    )


def _torch_vit(backbone_pytree, cfg: ViTConfig):
    """A torch ViTModel carrying exactly our backbone's weights."""
    model = transformers.ViTModel(_hf_vit_config(cfg), add_pooling_layer=True)
    sd = convert_to_hf_state_dict(jax.device_get(backbone_pytree), cfg)
    model.load_state_dict(
        {k: torch.from_numpy(np.array(v)) for k, v in sd.items()}, strict=True
    )
    return model


def _copy_mlp_head(head_pytree) -> "torch.nn.Sequential":
    """Our mlp head pytree -> torch Linear/ReLU stack (heads.py layout)."""
    layers = []
    n = len(head_pytree)
    for i in range(n):
        p = head_pytree[f"linear_{i}"]
        lin = torch.nn.Linear(p["w"].shape[0], p["w"].shape[1])
        with torch.no_grad():
            lin.weight.copy_(torch.from_numpy(np.array(p["w"]).T))
            lin.bias.copy_(torch.from_numpy(np.array(p["b"])))
        layers.append(lin)
        if i < n - 1:
            layers.append(torch.nn.ReLU())
    return torch.nn.Sequential(*layers)


def _features(net, x):
    """ViTBackbone.forward semantics: hidden_states[-1].mean(dim=1) — the
    PRE-final-layernorm last block output (ssp_vit2spn_tiny.py:114-118)."""
    return net(x, output_hidden_states=True).hidden_states[-1].mean(dim=1)


def _torch_views(mb_u8: np.ndarray, aug: AugmentConfig) -> "torch.Tensor":
    """The deterministic eval transform, computed independently of our
    augment code: uint8 gray -> [0,1] -> replicate to 3ch -> Normalize."""
    gray = mb_u8[..., 0].astype(np.float32) / 255.0  # (B, H, W)
    mean = np.asarray(aug.normalize_mean, np.float32)[:, None, None]
    std = np.asarray(aug.normalize_std, np.float32)[:, None, None]
    x = (np.repeat(gray[:, None], 3, axis=1) - mean) / std
    return torch.from_numpy(x)


def test_training_trajectory_matches_torch_reference():
    cfg = _cfg()
    a, b = cfg.accumulation_steps, cfg.batch_size

    from vit2spn_tpu.data.augment import augment_batch
    from vit2spn_tpu.train.ssp import SSPTrainer
    from vit2spn_tpu.utils.logging import MetricLogger

    trainer = SSPTrainer(cfg, logger=MetricLogger(echo=False))
    params0 = jax.device_get(trainer.state.params)

    # ---- torch reimplementation of the reference loop, seeded with the
    # SAME initial weights ----
    online = [
        _torch_vit(backbone_slice(params0.online, i), cfg.vit) for i in range(2)
    ]
    target = [
        _torch_vit(backbone_slice(params0.target, i), cfg.vit) for i in range(2)
    ]
    for net in target:
        for p in net.parameters():
            p.requires_grad_(False)
    projection = _copy_mlp_head(params0.heads["projection"])
    prediction = _copy_mlp_head(params0.heads["prediction"])
    trainable = [p for net in online for p in net.parameters()]
    trainable += list(projection.parameters()) + list(prediction.parameters())
    opt = torch.optim.Adam(trainable, lr=cfg.learning_rate)

    rng = np.random.default_rng(0)
    batches = rng.integers(0, 256, (N_STEPS, a * b, 32, 32, 1), dtype=np.uint8)

    # precondition: with augmentation disabled and sources already at
    # out_size, our on-device eval transform is exactly gray/255 — so the
    # torch pipeline above sees the same model inputs
    v_eval = augment_batch(jax.random.key(0), jnp.asarray(batches[0]),
                           cfg.data.augment, fold_normalize=True)
    np.testing.assert_allclose(
        np.asarray(v_eval), batches[0][..., 0].astype(np.float32) / 255.0,
        atol=1e-6,
    )

    torch_losses = []
    for s in range(N_STEPS):
        micro_losses = []
        opt.zero_grad()
        for m in range(a):
            x = _torch_views(batches[s, m * b:(m + 1) * b], cfg.data.augment)
            f_on = torch.cat([_features(online[0], x), _features(online[1], x)], dim=1)
            with torch.no_grad():
                f_tg = torch.cat(
                    [_features(target[0], x), _features(target[1], x)], dim=1
                )
            pred = prediction(projection(f_on))
            tgt = projection(f_tg).detach()
            loss = -torch.nn.functional.cosine_similarity(pred, tgt, dim=-1).mean()
            (loss / a).backward()  # ssp_vit2spn_tiny.py:211-213
            micro_losses.append(float(loss.detach()))
        opt.step()  # :215-219 — then EMA, once per optimizer step
        with torch.no_grad():
            for t_net, o_net in zip(target, online):
                for t, o in zip(t_net.parameters(), o_net.parameters()):
                    t.mul_(cfg.ema_momentum).add_(o, alpha=1 - cfg.ema_momentum)
        torch_losses.append(float(np.mean(micro_losses)))

    # ---- our jitted step on the identical inputs ----
    jax_losses = []
    for s in range(N_STEPS):
        metrics = trainer.train_step(batches[s], jax.random.key(s))
        jax_losses.append(float(metrics["loss"]))

    np.testing.assert_allclose(jax_losses, torch_losses, atol=3e-5)
    assert abs(jax_losses[0] - jax_losses[-1]) > 1e-6  # training moved

    # ---- post-training parameter parity: online (grad + Adam path),
    # target (EMA path), heads (shared-projection grad path) ----
    params_n = jax.device_get(trainer.state.params)
    for jax_tree, torch_net in (
        (backbone_slice(params_n.online, 0), online[0]),
        (backbone_slice(params_n.online, 1), online[1]),
        (backbone_slice(params_n.target, 0), target[0]),
    ):
        sd_jax = convert_to_hf_state_dict(jax_tree, cfg.vit)
        sd_torch = torch_net.state_dict()
        assert set(sd_jax) == set(sd_torch)
        for k in sd_jax:
            np.testing.assert_allclose(
                sd_jax[k], sd_torch[k].numpy(), atol=2e-5,
                err_msg=f"backbone param {k}",
            )
    np.testing.assert_allclose(
        np.array(params_n.heads["projection"]["linear_0"]["w"]).T,
        projection[0].weight.detach().numpy(), atol=2e-5,
    )
    np.testing.assert_allclose(
        np.array(params_n.heads["prediction"]["linear_1"]["w"]).T,
        prediction[2].weight.detach().numpy(), atol=2e-5,
    )


def test_single_stream_forward_wiring_matches_torch_reference():
    """C2 wiring parity with DISTINCT views (dsn_ssn/ssp_single.py:103-138):
    online sees view1, target sees view2, projection input is 192 (one
    stream, no concat), the target path runs through the SAME trainable
    projection head detached, and the EMA update uses momentum 0.99. The
    trajectory tests above run with view1 == view2 (augmentation disabled),
    so this is the test that pins the view->stream routing itself."""
    import dataclasses

    from vit2spn_tpu.core.dtypes import DTypePolicy
    from vit2spn_tpu.models.ssp import (
        dual_stream_forward,
        ema_update,
        init_dual_stream,
    )

    cfg = dataclasses.replace(
        _cfg(), dual_stream=False, ema_momentum=0.99,
        proj_hidden=64, proj_dim=32,
    )
    params = init_dual_stream(jax.random.key(11), cfg)
    p0 = jax.device_get(params)

    online_t = _torch_vit(backbone_slice(p0.online, 0), cfg.vit)
    target_t = _torch_vit(backbone_slice(p0.target, 0), cfg.vit)
    projection = _copy_mlp_head(p0.heads["projection"])
    prediction = _copy_mlp_head(p0.heads["prediction"])
    assert projection[0].weight.shape[1] == cfg.vit.hidden_size  # proj-in 192-equiv

    rng = np.random.default_rng(7)
    # distinct raw views, channels-last uint8 like the data pipeline
    v1_u8 = rng.integers(0, 256, (4, 32, 32, 1), dtype=np.uint8)
    v2_u8 = rng.integers(0, 256, (4, 32, 32, 1), dtype=np.uint8)

    # ours: eval-transform views (gray/255 -> replicate -> normalize)
    from vit2spn_tpu.data.augment import augment_batch

    aug = cfg.data.augment
    va = augment_batch(jax.random.key(0), jnp.asarray(v1_u8), aug)
    vb = augment_batch(jax.random.key(0), jnp.asarray(v2_u8), aug)
    pred, tgt = dual_stream_forward(
        params, va, vb, cfg, DTypePolicy.from_str("float32"), train=False
    )

    with torch.no_grad():
        f_on = _features(online_t.eval(), _torch_views(v1_u8, aug))
        f_tg = _features(target_t.eval(), _torch_views(v2_u8, aug))
        pred_t = prediction(projection(f_on))
        tgt_t = projection(f_tg)
    np.testing.assert_allclose(np.asarray(pred), pred_t.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(tgt), tgt_t.numpy(), atol=2e-5)

    # swapping the views must change the ONLINE output (routing, not symmetry)
    pred_sw, _ = dual_stream_forward(
        params, vb, va, cfg, DTypePolicy.from_str("float32"), train=False
    )
    assert np.abs(np.asarray(pred_sw) - np.asarray(pred)).max() > 1e-4

    # EMA momentum 0.99 (dsn_ssn/ssp_single.py:136)
    new_target = jax.device_get(
        ema_update(params.target, params.online, cfg.ema_momentum)
    )
    with torch.no_grad():
        for t, o in zip(target_t.parameters(), online_t.parameters()):
            t.mul_(0.99).add_(o, alpha=0.01)
    sd_jax = convert_to_hf_state_dict(backbone_slice(new_target, 0), cfg.vit)
    sd_torch = target_t.state_dict()
    for k in sd_jax:
        np.testing.assert_allclose(sd_jax[k], sd_torch[k].numpy(), atol=2e-6,
                                   err_msg=f"EMA param {k}")


def test_finetune_trajectory_matches_torch_reference():
    """Same cross-framework drill for the fine-tune path
    (octmnist_ft_vit2spn.py:73-126): weighted CrossEntropyLoss, torch
    Adam(weight_decay) L2-into-gradient semantics, and the BatchNorm1d
    classifier head (batch-stats train normalization + unbiased running-stat
    updates + eval-mode running stats)."""
    from vit2spn_tpu.core.config import FineTuneConfig
    from vit2spn_tpu.data.datasets import Dataset
    from vit2spn_tpu.train.finetune import FineTuneTrainer
    from vit2spn_tpu.utils.logging import MetricLogger

    num_classes, n_train, n_val, bs = 3, 48, 16, 8
    cfg = FineTuneConfig(
        vit=ViTConfig(image_size=32, patch_size=16, hidden_size=32,
                      num_layers=2, num_heads=2, mlp_dim=64),
        data=DataConfig(name="synthetic",
                        augment=AugmentConfig(out_size=32, enabled=False)),
        batch_size=bs,
        head_hidden=16,
        head_dropout=0.0,  # see module docstring
        compute_dtype="float32",
    )
    rng = np.random.default_rng(1)

    def mkds(n, name):
        return Dataset(
            name=name,
            images=rng.integers(0, 256, (n, 32, 32, 1), dtype=np.uint8),
            labels=rng.integers(0, num_classes, n).astype(np.int64),
            num_classes=num_classes,
            class_names=[str(c) for c in range(num_classes)],
        )

    train_ds, val_ds = mkds(n_train, "tr"), mkds(n_val, "va")
    # non-uniform weights so the weighted-mean normalization is exercised
    class_weights = np.array([1.0, 2.0, 0.5], np.float32)

    trainer = FineTuneTrainer(cfg, num_classes, eval_augment=False,
                              logger=MetricLogger(echo=False))
    state0 = jax.device_get(trainer.state)

    # ---- torch FineTunedModel from spec, seeded with the same weights ----
    backbone = _torch_vit(state0.backbone, cfg.vit)
    lin0 = torch.nn.Linear(cfg.vit.hidden_size, cfg.head_hidden)
    bn = torch.nn.BatchNorm1d(cfg.head_hidden)
    lin1 = torch.nn.Linear(cfg.head_hidden, num_classes)
    with torch.no_grad():
        lin0.weight.copy_(torch.from_numpy(np.array(state0.head["linear_0"]["w"]).T))
        lin0.bias.copy_(torch.from_numpy(np.array(state0.head["linear_0"]["b"])))
        bn.weight.copy_(torch.from_numpy(np.array(state0.head["bn"]["scale"])))
        bn.bias.copy_(torch.from_numpy(np.array(state0.head["bn"]["bias"])))
        lin1.weight.copy_(torch.from_numpy(np.array(state0.head["linear_1"]["w"]).T))
        lin1.bias.copy_(torch.from_numpy(np.array(state0.head["linear_1"]["b"])))
    crit = torch.nn.CrossEntropyLoss(weight=torch.from_numpy(class_weights))
    opt = torch.optim.Adam(
        list(backbone.parameters()) + list(lin0.parameters())
        + list(bn.parameters()) + list(lin1.parameters()),
        lr=cfg.learning_rate, weight_decay=cfg.weight_decay,
    )

    def torch_logits(x_u8, train):
        backbone.train(train), bn.train(train)
        f = _features(backbone, _torch_views(x_u8, cfg.data.augment))
        return lin1(torch.relu(bn(lin0(f))))

    # ---- 2 epochs over identical batch orders ----
    images_dev, labels_dev = trainer._device_data(train_ds)
    weights_dev = jnp.asarray(class_weights)
    torch_epoch_losses, jax_epoch_losses = [], []
    for epoch in range(2):
        idx_mat = rng.permutation(n_train)[: (n_train // bs) * bs].reshape(-1, bs)
        trainer.state, tl = trainer._train_epoch(
            trainer.state, images_dev, labels_dev,
            jnp.asarray(idx_mat, jnp.int32), weights_dev,
            jax.random.key(epoch), jnp.asarray(1.0, jnp.float32),
        )
        jax_epoch_losses.append(float(tl))

        step_losses = []
        for idx in idx_mat:
            x, y = train_ds.images[idx], torch.from_numpy(train_ds.labels[idx])
            opt.zero_grad()
            loss = crit(torch_logits(x, train=True), y)
            loss.backward()
            opt.step()
            step_losses.append(float(loss.detach()))
        torch_epoch_losses.append(float(np.mean(step_losses)))

    np.testing.assert_allclose(jax_epoch_losses, torch_epoch_losses, atol=3e-5)

    # ---- eval parity: running-stat BN + weighted NLL + probs ----
    val_loss, probs, labels = trainer.evaluate(val_ds, class_weights)
    # the reference's val loss is the MEAN OF PER-BATCH weighted means
    # (octmnist_ft_vit2spn.py:109-115's loop accumulation), which is what
    # eval_pass reproduces — batch the torch side identically
    probs_t, batch_losses_t = [], []
    with torch.no_grad():
        for s in range(0, n_val, bs):
            logits_t = torch_logits(val_ds.images[s:s + bs], train=False)
            probs_t.append(torch.softmax(logits_t, dim=-1).numpy())
            batch_losses_t.append(float(
                crit(logits_t, torch.from_numpy(val_ds.labels[s:s + bs]))
            ))
    np.testing.assert_allclose(probs, np.concatenate(probs_t), atol=2e-5)
    np.testing.assert_allclose(val_loss, np.mean(batch_losses_t), atol=3e-5)

    # ---- post-training parameters, incl. BN running stats ----
    # Param tolerance: Adam turns sub-eps gradient components into ±lr-sized
    # steps (m̂/(√v̂+eps) saturates to ±1), so fp32 cross-framework noise on
    # low-gradient dims amplifies to a few lr per flip — observed ~2e-4 over
    # the 12 steps here. 5e-4 accommodates that while still catching
    # semantic bugs (e.g. decaying torch-skipped inert leaves shows up at
    # steps*lr = 1.2e-3).
    state_n = jax.device_get(trainer.state)
    sd_jax = convert_to_hf_state_dict(state_n.backbone, cfg.vit)
    sd_torch = backbone.state_dict()
    for k in sd_jax:
        np.testing.assert_allclose(sd_jax[k], sd_torch[k].numpy(), atol=5e-4,
                                   err_msg=f"backbone param {k}")
    np.testing.assert_allclose(np.array(state_n.head["linear_1"]["w"]).T,
                               lin1.weight.detach().numpy(), atol=5e-4)
    np.testing.assert_allclose(np.array(state_n.head["bn"]["scale"]),
                               bn.weight.detach().numpy(), atol=5e-4)
    np.testing.assert_allclose(np.array(state_n.bn_state["mean"]),
                               bn.running_mean.numpy(), atol=5e-4)
    np.testing.assert_allclose(np.array(state_n.bn_state["var"]),
                               bn.running_var.numpy(), atol=5e-4)
