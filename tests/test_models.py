import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit2spn_tpu.core.config import SSPConfig, ViTConfig
from vit2spn_tpu.models.ssp import (
    dual_stream_forward,
    ema_update,
    init_dual_stream,
    negative_cosine_loss,
)
from vit2spn_tpu.models.vit import count_params, init_vit, vit_features, vit_forward


def test_vit_shapes(tiny_vit):
    params = init_vit(jax.random.key(0), tiny_vit)
    x = jax.random.normal(jax.random.key(1), (3, 32, 32, 3))
    out = vit_forward(params, x, tiny_vit)
    assert out["pre_ln"].shape == (3, tiny_vit.seq_len, tiny_vit.hidden_size)
    assert out["last_hidden_state"].shape == out["pre_ln"].shape
    feats = vit_features(params, x, tiny_vit)
    assert feats.shape == (3, tiny_vit.hidden_size)
    # features come from PRE-layernorm output (HF hidden_states[-1] semantics)
    pre_mean = jnp.mean(out["pre_ln"], axis=1)
    np.testing.assert_allclose(np.asarray(feats), np.asarray(pre_mean), atol=1e-5)


def test_param_count_matches_reference():
    """Reference reports 11.68M trainable params (README.md:10,
    ssp_vit2spn_tiny.py:238-239): 2 online ViT-Tiny backbones (incl. the
    inert HF pooler) + projection + prediction heads."""
    cfg = SSPConfig()
    params = init_dual_stream(jax.random.key(0), cfg)
    trainable = count_params(params.online) + count_params(params.heads)
    assert trainable == 11_681_408
    single_vit = count_params(init_vit(jax.random.key(0), ViTConfig()))
    assert single_vit == 5_561_472  # HF vit-tiny incl. pooler


def test_dual_stream_forward_and_loss(tiny_ssp):
    params = init_dual_stream(jax.random.key(0), tiny_ssp)
    v1 = jax.random.normal(jax.random.key(1), (4, 32, 32, 3))
    v2 = jax.random.normal(jax.random.key(2), (4, 32, 32, 3))
    pred, tgt = dual_stream_forward(params, v1, v2, tiny_ssp)
    assert pred.shape == (4, tiny_ssp.proj_dim)
    assert tgt.shape == (4, tiny_ssp.proj_dim)
    loss = negative_cosine_loss(pred, tgt)
    assert -1.0 <= float(loss) <= 1.0
    # perfectly aligned vectors give loss -1
    assert float(negative_cosine_loss(pred, 2.0 * pred)) == pytest.approx(-1.0, abs=1e-6)


def test_target_gets_no_gradient(tiny_ssp):
    params = init_dual_stream(jax.random.key(0), tiny_ssp)
    v1 = jax.random.normal(jax.random.key(1), (2, 32, 32, 3))

    def loss(target):
        p = params._replace(target=target)
        pred, tgt = dual_stream_forward(p, v1, v1, tiny_ssp)
        return negative_cosine_loss(pred, tgt)

    grads = jax.grad(loss)(params.target)
    total = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads))
    assert total == 0.0


def test_ema_update(tiny_ssp):
    params = init_dual_stream(jax.random.key(0), tiny_ssp)
    new_target = ema_update(params.target, params.online, 0.999)
    t0 = jax.tree.leaves(params.target)[0]
    o0 = jax.tree.leaves(params.online)[0]
    n0 = jax.tree.leaves(new_target)[0]
    np.testing.assert_allclose(
        np.asarray(n0), 0.999 * np.asarray(t0) + 0.001 * np.asarray(o0), rtol=1e-6
    )


def test_pretrained_init_identical_scratch_independent(tiny_ssp):
    """Pretrained path: all four backbones identical. Scratch path
    (ssl_vit2spn_scratch.py): online/target independently initialized."""
    backbone = init_vit(jax.random.key(5), tiny_ssp.vit)
    p = init_dual_stream(jax.random.key(0), tiny_ssp, backbone_params=backbone)
    a = p.online["patch_embed"]["kernel"][0]  # stream-1 online
    b = p.target["patch_embed"]["kernel"][1]  # stream-2 target
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    p2 = init_dual_stream(jax.random.key(0), tiny_ssp)  # scratch
    a2 = np.asarray(p2.online["patch_embed"]["kernel"][0])
    b2 = np.asarray(p2.target["patch_embed"]["kernel"][0])
    assert not np.array_equal(a2, b2)
    # streams also independent of each other
    assert not np.array_equal(a2, np.asarray(p2.online["patch_embed"]["kernel"][1]))


def test_single_stream(tiny_ssp):
    import dataclasses

    cfg = dataclasses.replace(tiny_ssp, dual_stream=False, ema_momentum=0.99)
    params = init_dual_stream(jax.random.key(0), cfg)
    assert params.online["patch_embed"]["kernel"].shape[0] == 1  # one stream
    v1 = jax.random.normal(jax.random.key(1), (2, 32, 32, 3))
    v2 = jax.random.normal(jax.random.key(2), (2, 32, 32, 3))
    pred, tgt = dual_stream_forward(params, v1, v2, cfg)
    assert pred.shape == (2, cfg.proj_dim)
