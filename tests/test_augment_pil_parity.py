"""Geometric parity of the on-device warp against PIL — the engine behind
torchvision's transforms (Resize/rotate/affine all call into PIL ops in the
reference's pipeline). Not bitwise (we evaluate ONE composed bilinear map,
PIL chains separate resamplings); the assertions bound the per-pixel
deviation, which is the quantity that matters for mAUC parity."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

PIL = pytest.importorskip("PIL.Image")

from vit2spn_tpu.core.config import AugmentConfig  # noqa: E402
from vit2spn_tpu.data.augment import augment_batch  # noqa: E402


def _geom_only_cfg(**kw):
    """All photometric ops off; geometric params as given (0 disables)."""
    base = dict(
        hflip_prob=0.0, vflip_prob=0.0, rotation_degrees=0.0,
        affine_degrees=0.0, affine_translate=(0.0, 0.0),
        affine_scale=(1.0, 1.0), affine_shear=0.0,
        jitter_brightness=0.0, jitter_contrast=0.0, jitter_saturation=0.0,
        jitter_hue=0.0, blur_sigma=(1e-6, 1e-6), erasing_prob=0.0,
        normalize_mean=(0.0, 0.0, 0.0), normalize_std=(1.0, 1.0, 1.0),
        out_size=224,
    )
    base.update(kw)
    return AugmentConfig(**base)


@pytest.fixture(scope="module")
def src_img():
    rng = np.random.default_rng(0)
    # smooth-ish structured image (pure noise makes interpolation diffs noisy)
    y, x = np.mgrid[0:28, 0:28] / 28.0
    img = 0.5 + 0.4 * np.sin(6 * x + 3 * y) * np.cos(4 * y)
    img += rng.normal(0, 0.02, img.shape)
    return (np.clip(img, 0, 1) * 255).astype(np.uint8)


def _ours(cfg, img_u8, seed=0):
    out = augment_batch(
        jax.random.key(seed), jnp.asarray(img_u8[None, ..., None]), cfg
    )
    return np.asarray(out)[0, ..., 0]


def test_pure_resize_matches_pil(src_img):
    cfg = _geom_only_cfg()
    ours = _ours(cfg, src_img)
    pil = np.asarray(
        PIL.fromarray(src_img).resize((224, 224), PIL.BILINEAR),
        dtype=np.float32,
    ) / 255.0
    assert np.abs(ours - pil).mean() < 5e-3
    assert np.abs(ours - pil).max() < 5e-2


def test_rotation_matches_pil(src_img):
    """Fixed rotation: PIL rotate(angle, NEAREST) then BILINEAR resize vs our
    composed warp. Interior pixels must agree closely; borders (fill region
    boundary) get a looser bound."""
    angle = 17.0
    cfg = dataclasses.replace(
        _geom_only_cfg(), rotation_degrees=angle,
    )
    # force the sampled rotation to `angle`: rotation ~ U(-a, a); instead use
    # the deterministic path by sampling many draws and selecting... simpler:
    # evaluate our warp via the private API with a fixed matrix
    from vit2spn_tpu.data.augment import _warp_batch

    rad = np.deg2rad(angle)
    # torchvision rotate(angle) maps output->source with R(angle) (inverse of
    # R(-angle)); PIL.rotate(angle) rotates counterclockwise
    inv = jnp.asarray(
        [[[np.cos(rad), -np.sin(rad)], [np.sin(rad), np.cos(rad)]]],
        dtype=jnp.float32,
    )
    gray = jnp.asarray(src_img[None].astype(np.float32) / 255.0)
    ours = np.asarray(
        _warp_batch(gray, inv, jnp.zeros((1, 2)), 224, 64, jnp.float32)
    )[0]

    pil = PIL.fromarray(src_img).rotate(angle, resample=PIL.NEAREST)
    pil = np.asarray(pil.resize((224, 224), PIL.BILINEAR), np.float32) / 255.0

    # compare away from the rotated-frame border (fill-edge rasterization
    # differs between NEAREST-then-resize and the composed bilinear map)
    interior = slice(40, 184)
    diff = np.abs(ours[interior, interior] - pil[interior, interior])
    assert diff.mean() < 0.03
    # and grossly over the full frame
    assert np.abs(ours - pil).mean() < 0.08


def test_hflip_exact(src_img):
    cfg = _geom_only_cfg(hflip_prob=1.0)
    ours = _ours(cfg, src_img)
    base = _ours(_geom_only_cfg(), src_img)
    np.testing.assert_allclose(ours, base[:, ::-1], atol=2e-2)


def test_blur_matches_pil_gaussian(src_img):
    """sigma fixed at 1.0: our 3-tap separable kernel vs PIL GaussianBlur
    radius... PIL's GaussianBlur differs in kernel support; compare against
    an explicit numpy 3x3 convolution with torchvision's kernel instead."""
    cfg = _geom_only_cfg(blur_sigma=(1.0, 1.0))
    ours = _ours(cfg, src_img)

    base = np.asarray(
        PIL.fromarray(src_img).resize((224, 224), PIL.BILINEAR), np.float32
    ) / 255.0
    k1 = np.exp(-0.5)  # exp(-x^2/2sigma^2) at x=1, sigma=1
    k = np.array([k1, 1.0, k1]); k /= k.sum()
    pad = np.pad(base, 1, mode="reflect")
    tmp = k[0]*pad[:-2, 1:-1] + k[1]*pad[1:-1, 1:-1] + k[2]*pad[2:, 1:-1]
    tmp = np.pad(tmp, ((0, 0), (1, 1)), mode="reflect")
    ref = k[0]*tmp[:, :-2] + k[1]*tmp[:, 1:-1] + k[2]*tmp[:, 2:]
    assert np.abs(ours - ref).mean() < 5e-3


def test_nonsquare_resize_matches_pil_squash(src_img):
    """Non-square sources squash to square like torchvision Resize((s,s))
    (ucsdoct_ft_vit2spn.py:30-43): the disabled-aug path resizes (H, W)
    directly to (out, out)."""
    nonsq = src_img[:, :21]  # (28, 21)
    cfg = dataclasses.replace(_geom_only_cfg(), enabled=False)
    ours = _ours(cfg, nonsq)
    pil = np.asarray(
        PIL.fromarray(nonsq).resize((224, 224), PIL.BILINEAR),
        dtype=np.float32,
    ) / 255.0
    assert np.abs(ours - pil).mean() < 5e-3
    assert np.abs(ours - pil).max() < 5e-2


def test_nonsquare_aug_equals_presquashed(src_img):
    """With augs ON, a non-square source must produce EXACTLY the result of
    first squashing it to the square band-limit size — non-square handling
    lives entirely in _band_limit's separable squash, same key → same draw."""
    import vit2spn_tpu.data.augment as aug_mod

    nonsq = jnp.asarray(src_img[None, :, :21, None])  # (1, 28, 21, 1)
    cfg = dataclasses.replace(
        _geom_only_cfg(), rotation_degrees=15.0, hflip_prob=0.5,
    )
    key = jax.random.key(7)
    out_nonsq = augment_batch(key, nonsq, cfg)

    gray = aug_mod._to_gray(nonsq).astype(jnp.float32)
    sq = aug_mod._separable_resize(gray, 28)  # min(band_limit, max(h, w))
    out_sq = augment_batch(
        key, (np.asarray(sq, np.float32)[..., None] * 255).astype(np.uint8),
        cfg,
    )
    # not bitwise (uint8 round-trip of the pre-squash), but tightly bounded
    assert np.abs(np.asarray(out_nonsq) - np.asarray(out_sq)).max() < 2e-2
