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
