"""Grayscale patch-embed folding (models/vit.py::fold_patch_embed_gray).

Every dataset in the reference is grayscale replicated to RGB before the
ImageNet-stats Normalize (ssp_vit2spn_tiny.py:84-96), and the patch embed is
linear — so channel replication + normalization fold exactly into the
patch-embed weights. These tests pin the fold against the unfolded
3-channel path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit2spn_tpu.core.config import AugmentConfig, SSPConfig, ViTConfig
from vit2spn_tpu.core.dtypes import FP32
from vit2spn_tpu.data.augment import augment_batch, dual_view_batch
from vit2spn_tpu.models.ssp import dual_stream_forward, init_dual_stream
from vit2spn_tpu.models.vit import init_vit, vit_features


def _rand_u8(key, shape):
    return np.asarray(
        jax.random.randint(key, shape, 0, 256, dtype=jnp.int32), np.uint8
    )


def test_fold_normalize_matches_normalized_output_exactly():
    cfg = AugmentConfig()
    key = jax.random.key(0)
    imgs = _rand_u8(jax.random.key(1), (4, 28, 28, 1))
    v3 = augment_batch(key, imgs, cfg, out_dtype=jnp.float32)
    vg = augment_batch(key, imgs, cfg, out_dtype=jnp.float32,
                       fold_normalize=True)
    assert vg.shape == (4, cfg.out_size, cfg.out_size)
    mean = jnp.asarray(cfg.normalize_mean)
    std = jnp.asarray(cfg.normalize_std)
    # not bitwise: the two jitted programs fuse differently; the fold itself
    # is exact algebra
    np.testing.assert_allclose(
        np.asarray(v3), np.asarray((vg[..., None] - mean) / std),
        rtol=0, atol=1e-6,
    )


def test_fold_normalize_disabled_aug_path():
    cfg = AugmentConfig(enabled=False)
    key = jax.random.key(0)
    imgs = _rand_u8(jax.random.key(2), (2, 28, 28, 1))
    v3 = augment_batch(key, imgs, cfg, out_dtype=jnp.float32)
    vg = augment_batch(key, imgs, cfg, out_dtype=jnp.float32,
                       fold_normalize=True)
    mean = jnp.asarray(cfg.normalize_mean)
    std = jnp.asarray(cfg.normalize_std)
    np.testing.assert_allclose(
        np.asarray(v3), np.asarray((vg[..., None] - mean) / std),
        rtol=0, atol=1e-6,
    )


@pytest.mark.parametrize("norm", [
    ((0.485, 0.456, 0.406), (0.229, 0.224, 0.225)),  # ImageNet stats
    ((0.5, 0.5, 0.5), (0.5, 0.5, 0.5)),  # UCSD variant (ucsdoct_ft:42)
])
def test_gray_features_match_replicated_3ch_features(norm):
    vit_cfg = ViTConfig(image_size=32, patch_size=16)
    params = init_vit(jax.random.key(0), vit_cfg)
    mean, std = norm
    gray = jax.random.uniform(jax.random.key(3), (2, 32, 32))
    x3 = (gray[..., None] - jnp.asarray(mean)) / jnp.asarray(std)

    f3 = vit_features(params, x3, vit_cfg, FP32)
    fg = vit_features(params, gray, vit_cfg, FP32, norm_fold=(mean, std))
    np.testing.assert_allclose(np.asarray(f3), np.asarray(fg),
                               rtol=0, atol=1e-4)


def test_gray_input_without_fold_raises():
    vit_cfg = ViTConfig(image_size=32, patch_size=16)
    params = init_vit(jax.random.key(0), vit_cfg)
    gray = jax.random.uniform(jax.random.key(4), (2, 32, 32))
    with pytest.raises(ValueError, match="norm_fold"):
        vit_features(params, gray, vit_cfg, FP32)


def test_dual_stream_forward_gray_matches_3ch():
    cfg = SSPConfig(
        vit=ViTConfig(image_size=32, patch_size=16),
        pretrained_init=False,
        compute_dtype="float32",
    )
    aug = cfg.data.augment
    params = init_dual_stream(jax.random.key(0), cfg)
    imgs = _rand_u8(jax.random.key(5), (4, 28, 28, 1))
    aug32 = type(aug)(**{**aug.__dict__, "out_size": 32})
    key = jax.random.key(6)
    v1, v2 = dual_view_batch(key, imgs, aug32, out_dtype=jnp.float32)
    g1, g2 = dual_view_batch(key, imgs, aug32, out_dtype=jnp.float32,
                             fold_normalize=True)
    norm_fold = (aug.normalize_mean, aug.normalize_std)

    pred3, tgt3 = dual_stream_forward(params, v1, v2, cfg, FP32,
                                      key=jax.random.key(7), train=True)
    predg, tgtg = dual_stream_forward(params, g1, g2, cfg, FP32,
                                      key=jax.random.key(7), train=True,
                                      norm_fold=norm_fold)
    np.testing.assert_allclose(np.asarray(pred3), np.asarray(predg),
                               rtol=0, atol=2e-4)
    np.testing.assert_allclose(np.asarray(tgt3), np.asarray(tgtg),
                               rtol=0, atol=2e-4)
