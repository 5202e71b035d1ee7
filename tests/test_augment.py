import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit2spn_tpu.core.config import AugmentConfig
from vit2spn_tpu.data.augment import augment_batch, dual_view_batch


CFG = AugmentConfig()


def _imgs(n=8, size=28, c=1, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray((rng.random((n, size, size, c)) * 255).astype(np.uint8))


def test_output_shape_and_dtype():
    out = augment_batch(jax.random.key(0), _imgs(), CFG)
    assert out.shape == (8, 224, 224, 3)
    assert out.dtype == jnp.float32
    out16 = augment_batch(jax.random.key(0), _imgs(), CFG, out_dtype=jnp.bfloat16)
    assert out16.dtype == jnp.bfloat16


def test_deterministic_per_key():
    a = augment_batch(jax.random.key(7), _imgs(), CFG)
    b = augment_batch(jax.random.key(7), _imgs(), CFG)
    c = augment_batch(jax.random.key(8), _imgs(), CFG)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert float(jnp.abs(a - c).mean()) > 1e-3


def test_identity_mode_is_resize_normalize():
    cfg = AugmentConfig.identity()
    imgs = _imgs(2, 28)
    out = augment_batch(jax.random.key(0), imgs, cfg)
    # invert normalization -> values in [0, 1]
    mean = np.array(cfg.normalize_mean)
    std = np.array(cfg.normalize_std)
    raw = np.asarray(out) * std + mean
    assert raw.min() >= -1e-5 and raw.max() <= 1.0 + 1e-5
    # grayscale replication: all 3 channels equal
    np.testing.assert_allclose(raw[..., 0], raw[..., 1], atol=1e-6)


def test_identity_constant_image_roundtrip():
    """A constant gray image must stay constant through resize+normalize."""
    cfg = AugmentConfig.identity()
    imgs = jnp.full((1, 28, 28, 1), 128, dtype=jnp.uint8)
    out = np.asarray(augment_batch(jax.random.key(0), imgs, cfg))
    expected = (128 / 255.0 - np.array(cfg.normalize_mean)) / np.array(cfg.normalize_std)
    np.testing.assert_allclose(out[0, 100, 100], expected, atol=1e-4)
    np.testing.assert_allclose(out.std(axis=(0, 1, 2)), 0.0, atol=1e-3)


def test_dual_views_independent():
    v1, v2 = dual_view_batch(jax.random.key(0), _imgs(), CFG)
    assert float(jnp.abs(v1 - v2).mean()) > 1e-3


def test_erasing_probability():
    """With p=1 there must be a zero-box (pre-normalize 0 -> -mean/std);
    with p=0 none of the erasure value should dominate."""
    cfg = dataclasses.replace(CFG, erasing_prob=1.0)
    imgs = jnp.full((16, 28, 28, 1), 255, dtype=jnp.uint8)
    out = np.asarray(augment_batch(jax.random.key(3), imgs, cfg))
    erased_value = -np.array(cfg.normalize_mean) / np.array(cfg.normalize_std)
    frac = np.isclose(out[..., 0], erased_value[0], atol=1e-4).mean(axis=(1, 2))
    # every image has an erased box covering ~2-20% of area (but the affine
    # warp's zero-fill corners also match; require at least the minimum box)
    assert (frac > 0.015).all()


def test_hflip_statistics():
    """Asymmetric image: flips should occur for ~half the draws."""
    cfg = AugmentConfig(
        hflip_prob=0.5, vflip_prob=0.0, rotation_degrees=0.0, affine_degrees=0.0,
        affine_translate=(0.0, 0.0), affine_scale=(1.0, 1.0), affine_shear=0.0,
        jitter_brightness=0.0, jitter_contrast=0.0, jitter_saturation=0.0,
        jitter_hue=0.0, blur_sigma=(0.1, 0.1), erasing_prob=0.0, out_size=28,
    )
    img = np.zeros((64, 28, 28, 1), np.uint8)
    img[:, :, :14, :] = 255  # left half bright
    out = np.asarray(augment_batch(jax.random.key(1), jnp.asarray(img), cfg))
    left = out[:, 14, 2, 0]
    flipped = (left < 0).mean()  # dark left => flipped
    assert 0.2 < flipped < 0.8


def test_normalization_stats_roughly_standard():
    out = np.asarray(augment_batch(jax.random.key(0), _imgs(32, 64), CFG))
    assert np.isfinite(out).all()
    assert abs(out.mean()) < 3.0


def test_rgb_input_grayscale_conversion():
    """RGB inputs go through ITU-R 601 gray conversion then replication."""
    rgb = _imgs(2, 32, c=3)
    out = augment_batch(jax.random.key(0), rgb, AugmentConfig.identity())
    out = np.asarray(out)
    a = out[..., 0] * CFG.normalize_std[0] + CFG.normalize_mean[0]
    b = out[..., 2] * CFG.normalize_std[2] + CFG.normalize_mean[2]
    np.testing.assert_allclose(a, b, atol=1e-5)
