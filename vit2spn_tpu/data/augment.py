"""On-device augmentation: the reference's strong-augmentation stack
(ssp_vit2spn_tiny.py:84-96, UCSD variant ucsdoct_ft_vit2spn.py:30-43) compiled
to XLA as ONE jitted batch function.

The reference runs this stack in 4 CPU dataloader-worker processes per view
(torchvision/PIL, ssp_vit2spn_tiny.py:101-107) — the classic input-bound
pattern. Here the host only supplies raw uint8 source images; everything else
runs on the TPU:

  Grayscale(3) -> HFlip(.5) -> VFlip(.3) -> Rotation(30) -> Affine(15, t=.1,
  s=(.8,1.2), shear=10) -> ColorJitter(.3,.3,.3,.1) -> Resize(224) ->
  GaussianBlur(3, sigma U(.1,2)) -> RandomErasing(.5, scale(.02,.2),
  ratio(.3,3.3)) -> Normalize

TPU-native design (all measured on v5e — XLA gathers are catastrophically
slow there, ~1s per 2048-view naive warp):

  * The four geometric ops + resize compose into ONE affine map.
  * That map is evaluated WITHOUT gathers: bilinear interpolation factorizes
    into per-axis tent weights, out[p] = sum_y tri(v(p)-y) sum_x tri(u(p)-x)
    img[y,x], so the warp is one batched GEMM (tent-weight matrix x image)
    plus a weighted reduction — pure MXU/VPU work (~30 ms per 2048 views in
    bf16 vs ~1000 ms for the gather form). Out-of-frame regions get tent
    weight 0 == PIL's zero fill.
  * The warp targets a small intermediate grid (64 or 128 px); the final
    resize to 224 is separable and runs as two matmuls against CONSTANT
    weight matrices that XLA folds.
  * Everything stays single-channel until normalization (every reference
    transform grayscales first), where the 3-channel broadcast is fused.
  * ColorJitter specialises to brightness+contrast (saturation/hue are exact
    identities on replicated-gray channels).

Randomness: explicit per-example keys; dual views draw two independent key
sets (DualViewTransform, ssp_vit2spn_tiny.py:75-82).

Known deviations from torchvision (documented; the parity bar is fine-tune
mAUC, not bitwise augmentation output — SURVEY.md section 7):
  * one composed bilinear warp instead of NEAREST-rotation then
    NEAREST-affine then BILINEAR-resize (less resampling noise);
  * ColorJitter clamps in float [0,1] instead of uint8 space, and PIL's
    rounded-int L-channel mean becomes the exact float mean;
  * RandomErasing's accept/reject loop is a single clamped draw (for
    out_size 224 and the reference's ranges the first draw always lands);
  * sources larger than 96 px are band-limited to 96 px before the warp
    (the reference rotates folder images at native resolution, then resizes).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from vit2spn_tpu.core.config import AugmentConfig


# --------------------------------------------------------------------------
# random parameter sampling (torchvision distributions)
# --------------------------------------------------------------------------

def _deg2rad(d):
    return d * (jnp.pi / 180.0)


def _sample_affine(key, cfg: AugmentConfig, src_h: int, src_w: int):
    """Sample the composed forward transform (flip -> rot -> affine) as an
    inverse 2x2 matrix + translation, in source-pixel coordinates about the
    center.

    torchvision draws: RandomRotation angle U(-30,30); RandomAffine angle
    U(-15,15), integer-rounded translation U(+-0.1*size), scale U(.8,1.2),
    x-shear U(-10,10).
    """
    ks = jax.random.split(key, 7)
    hflip = jax.random.bernoulli(ks[0], cfg.hflip_prob)
    vflip = jax.random.bernoulli(ks[1], cfg.vflip_prob)
    rot1 = _deg2rad(jax.random.uniform(
        ks[2], minval=-cfg.rotation_degrees, maxval=cfg.rotation_degrees))
    rot2 = _deg2rad(jax.random.uniform(
        ks[3], minval=-cfg.affine_degrees, maxval=cfg.affine_degrees))
    max_dx, max_dy = cfg.affine_translate[0] * src_w, cfg.affine_translate[1] * src_h
    t = jax.random.uniform(ks[4], (2,), minval=-1.0, maxval=1.0)
    tx, ty = jnp.round(t[0] * max_dx), jnp.round(t[1] * max_dy)
    scale = jax.random.uniform(
        ks[5], minval=cfg.affine_scale[0], maxval=cfg.affine_scale[1])
    shear = _deg2rad(jax.random.uniform(
        ks[6], minval=-cfg.affine_shear, maxval=cfg.affine_shear))

    # torchvision affine (about center): M = T(t) R(angle) Shear_x Scale
    cos2, sin2 = jnp.cos(rot2), jnp.sin(rot2)
    rot_m = jnp.array([[cos2, -sin2], [sin2, cos2]])
    shear_m = jnp.array([[1.0, -jnp.tan(shear)], [0.0, 1.0]])
    affine_m = rot_m @ shear_m * scale

    cos1, sin1 = jnp.cos(rot1), jnp.sin(rot1)
    rot1_m = jnp.array([[cos1, -sin1], [sin1, cos1]])

    fx = jnp.where(hflip, -1.0, 1.0)
    fy = jnp.where(vflip, -1.0, 1.0)
    flip_m = jnp.eye(2) * jnp.array([fx, fy])[:, None]

    # forward: p_out = affine_m @ rot1_m @ flip_m @ (p - c) + t + c
    fwd = affine_m @ rot1_m @ flip_m
    inv = jnp.linalg.inv(fwd)
    return inv, jnp.array([tx, ty])


# --------------------------------------------------------------------------
# gather-free batched warp (tent-weight GEMM)
# --------------------------------------------------------------------------

def _resize_matrix(n_in: int, n_out: int) -> jax.Array:
    """R[o, i] = bilinear weight of source row i for output row o, PIL
    convention src = (o + .5) * n_in/n_out - .5 clamped to the frame.
    Static shapes -> XLA constant-folds these."""
    o = jnp.arange(n_out, dtype=jnp.float32)
    pos = jnp.clip((o + 0.5) * (n_in / n_out) - 0.5, 0.0, n_in - 1.0)
    i = jnp.arange(n_in, dtype=jnp.float32)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(pos[:, None] - i[None, :]))
    return w / jnp.sum(w, axis=1, keepdims=True)


def _separable_resize(x: jax.Array, n_out: int) -> jax.Array:
    """(B, H, W) -> (B, n_out, n_out) via two constant matmuls."""
    _, h, w = x.shape
    ry = _resize_matrix(h, n_out).astype(x.dtype)
    rx = _resize_matrix(w, n_out).astype(x.dtype)
    return jnp.einsum("oh,bhw,pw->bop", ry, x, rx,
                      preferred_element_type=jnp.float32).astype(x.dtype)


def _warp_batch(
    imgs: jax.Array,  # (B, S, S) float, single channel
    inv: jax.Array,  # (B, 2, 2)
    trans: jax.Array,  # (B, 2)
    out_size: int,
    mid_size: int,
    compute_dtype=jnp.bfloat16,
) -> jax.Array:
    """Exact bilinear warp of the composed affine+resize map onto a
    (mid, mid) grid, gather-free:

      u(p), v(p) are affine in the mid-grid coords, and
      bilinear(img, u, v) = sum_y tri(v - y) * sum_x tri(u - x) * img[y, x]

    -> one batched (mid^2, S) x (S, S) GEMM + a tent-weighted reduction.
    Out-of-frame positions receive zero tent mass == PIL zero fill.
    Returns (B, out, out) after the separable mid->out resize.
    """
    b, s, _ = imgs.shape
    c = (s - 1) / 2.0  # PIL rotation center

    m = jnp.arange(mid_size, dtype=jnp.float32)
    # mid-grid -> source resize coords, clamped to the frame: PIL's resize
    # edge rule. Without the clamp the edge pixels lose tent mass (outermost
    # output rows darken ~28%); zero fill belongs to the AFFINE stage only.
    g = jnp.clip((m + 0.5) * (s / mid_size) - 0.5, 0.0, s - 1.0)

    px = (g[None, None, :] - c) - trans[:, 0][:, None, None]  # (B, 1, M)
    py = (g[None, :, None] - c) - trans[:, 1][:, None, None]  # (B, M, 1)
    u = inv[:, 0, 0][:, None, None] * px + inv[:, 0, 1][:, None, None] * py + c
    v = inv[:, 1, 0][:, None, None] * px + inv[:, 1, 1][:, None, None] * py + c

    grid = jnp.arange(s, dtype=jnp.float32)
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(u[..., None] - grid))  # (B, M, M, S)
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(v[..., None] - grid))

    wx = wx.astype(compute_dtype).reshape(b, mid_size * mid_size, s)
    wy = wy.astype(compute_dtype).reshape(b, mid_size * mid_size, s)
    rows = jnp.matmul(  # contract x: (B, M², S_y)
        wx, imgs.astype(compute_dtype).transpose(0, 2, 1),
        preferred_element_type=jnp.float32,
    ).astype(compute_dtype)
    mid = jnp.sum(wy * rows, axis=-1).reshape(b, mid_size, mid_size)
    return _separable_resize(mid.astype(compute_dtype), out_size)


def _band_limit(imgs: jax.Array, max_src: int = 96) -> jax.Array:
    """Pre-shrink large sources separably so tent matrices stay small, and
    squash non-square sources to square — torchvision's `Resize((s, s))`
    aspect-squash semantics (octird_ft_vit2spn.py:61, ucsdoct:30), which the
    square-only `_warp_batch` then consumes. Real OCTID/UCSD scans are
    non-square (e.g. 496x512); the device path takes them natively."""
    h, w = imgs.shape[1], imgs.shape[2]
    if h != w or h > max_src or w > max_src:
        return _separable_resize(imgs, min(max_src, max(h, w)))
    return imgs


def _mid_size_for(src: int) -> int:
    return 64 if src <= 48 else 128


# --------------------------------------------------------------------------
# photometric (batched)
# --------------------------------------------------------------------------

_LUMA = jnp.array([0.299, 0.587, 0.114])  # ITU-R 601 (PIL "L" conversion)


def _to_gray(images_u8: jax.Array) -> jax.Array:
    """uint8 (B, H, W, C in {1,3}) -> float (B, H, W) in [0, 1]."""
    x = images_u8.astype(jnp.float32) / 255.0
    if images_u8.shape[-1] == 3:
        return jnp.tensordot(x, _LUMA, axes=[[-1], [0]])
    return x[..., 0]


def _color_jitter_gray_batch(key, imgs: jax.Array, cfg: AugmentConfig):
    """ColorJitter specialised to grayscale (saturation/hue are exact
    identities on replicated channels): brightness/contrast factors
    U(1-j, 1+j) in random relative order, PIL-style clamp to [0,1]."""
    b = imgs.shape[0]
    kb, kc, ko = jax.random.split(key, 3)
    fb = jax.random.uniform(kb, (b, 1, 1), minval=1 - cfg.jitter_brightness,
                            maxval=1 + cfg.jitter_brightness)
    fc = jax.random.uniform(kc, (b, 1, 1), minval=1 - cfg.jitter_contrast,
                            maxval=1 + cfg.jitter_contrast)
    b_first = jax.random.bernoulli(ko, 0.5, (b, 1, 1))
    fb = fb.astype(imgs.dtype)
    fc = fc.astype(imgs.dtype)

    def bright(x):
        return jnp.clip(x * fb, 0.0, 1.0)

    def contrast(x):
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        return jnp.clip(mean + fc * (x - mean), 0.0, 1.0)

    return jnp.where(b_first, contrast(bright(imgs)), bright(contrast(imgs)))


def _gaussian_blur3_batch(key, imgs: jax.Array, cfg: AugmentConfig):
    """3x3 separable gaussian, per-image sigma ~ U(blur_sigma); torchvision
    builds the 1D kernel from the pdf on {-1,0,1}, pads reflect. Two batched
    3-tap shift-adds."""
    b = imgs.shape[0]
    sigma = jax.random.uniform(key, (b, 1, 1), minval=cfg.blur_sigma[0],
                               maxval=cfg.blur_sigma[1])
    k1 = jnp.exp(-0.5 / (sigma * sigma))
    k0 = jnp.ones_like(k1)
    norm = k0 + 2 * k1
    k0, k1 = (k0 / norm).astype(imgs.dtype), (k1 / norm).astype(imgs.dtype)

    def blur_axis(x, axis):
        lo = jax.lax.slice_in_dim(x, 1, 2, axis=axis)  # reflect pad
        hi = jax.lax.slice_in_dim(x, x.shape[axis] - 2, x.shape[axis] - 1, axis=axis)
        pad = jnp.concatenate([lo, x, hi], axis=axis)
        n = x.shape[axis]
        s0 = jax.lax.slice_in_dim(pad, 0, n, axis=axis)
        s1 = jax.lax.slice_in_dim(pad, 1, n + 1, axis=axis)
        s2 = jax.lax.slice_in_dim(pad, 2, n + 2, axis=axis)
        return k1 * s0 + k0 * s1 + k1 * s2

    return blur_axis(blur_axis(imgs, 1), 2)


def _random_erasing_batch(key, imgs: jax.Array, cfg: AugmentConfig):
    """RandomErasing(p, scale, ratio, value=0) — single-draw equivalent of
    torchvision's accept/reject loop (always accepted for these ranges)."""
    b, h, w = imgs.shape
    ks = jax.random.split(key, 5)
    do = jax.random.bernoulli(ks[0], cfg.erasing_prob, (b, 1, 1))
    area = h * w * jax.random.uniform(
        ks[1], (b,), minval=cfg.erasing_scale[0], maxval=cfg.erasing_scale[1])
    ratio = jnp.exp(jax.random.uniform(
        ks[2], (b,),
        minval=jnp.log(cfg.erasing_ratio[0]),
        maxval=jnp.log(cfg.erasing_ratio[1])))
    eh = jnp.clip(jnp.round(jnp.sqrt(area * ratio)), 1, h - 1)
    ew = jnp.clip(jnp.round(jnp.sqrt(area / ratio)), 1, w - 1)
    # uniform over [0, h-eh] like torchvision (traced bound -> scaled float)
    i0 = jnp.floor(jax.random.uniform(ks[3], (b,)) * (h - eh + 1))
    j0 = jnp.floor(jax.random.uniform(ks[4], (b,)) * (w - ew + 1))

    rows = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    cols = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    i0, j0 = i0[:, None, None], j0[:, None, None]
    eh, ew = eh[:, None, None], ew[:, None, None]
    inside = (rows >= i0) & (rows < i0 + eh) & (cols >= j0) & (cols < j0 + ew)
    return jnp.where(inside & do, jnp.zeros((), imgs.dtype), imgs)


# --------------------------------------------------------------------------
# full pipeline
# --------------------------------------------------------------------------

def _augment_batch_impl(key, images_u8, cfg: AugmentConfig, out_dtype,
                        fold_normalize=False):
    """With `fold_normalize`, return the PRE-normalize single-channel stack
    (B, out, out) instead of the normalized 3-channel tensor: every dataset
    here is grayscale replicated to RGB, and the patch embedding is linear,
    so channel replication + per-channel normalization fold exactly into the
    patch-embed weights (models/vit.py::fold_patch_embed_gray) — the
    (B, 224, 224, 3) materialization drops out of the hot loop."""
    b = images_u8.shape[0]
    gray = _to_gray(images_u8)  # (B, H, W) f32

    mean = jnp.asarray(cfg.normalize_mean, dtype=jnp.float32)
    std = jnp.asarray(cfg.normalize_std, dtype=jnp.float32)

    if not cfg.enabled:
        out = _separable_resize(gray, cfg.out_size)
        if fold_normalize:
            return out.astype(out_dtype)
        out3 = (out[..., None] - mean) / std
        return out3.astype(out_dtype)

    compute = jnp.bfloat16 if out_dtype == jnp.bfloat16 else jnp.float32
    gray = _band_limit(gray.astype(compute), cfg.band_limit)
    s = gray.shape[1]

    kg, kj, kb, ke = jax.random.split(key, 4)
    inv, trans = jax.vmap(
        lambda k: _sample_affine(k, cfg, s, s)
    )(jax.random.split(kg, b))

    out = _warp_batch(gray, inv, trans, cfg.out_size, _mid_size_for(s), compute)
    out = _color_jitter_gray_batch(kj, out, cfg)
    out = _gaussian_blur3_batch(kb, out, cfg)
    out = _random_erasing_batch(ke, out, cfg)
    if fold_normalize:
        return out.astype(out_dtype)
    out3 = (out[..., None].astype(jnp.float32) - mean) / std
    return out3.astype(out_dtype)


@functools.partial(
    jax.jit, static_argnames=("cfg", "out_dtype", "fold_normalize")
)
def augment_batch(
    key: jax.Array,
    images: jax.Array,  # uint8 (B, H, W, C)
    cfg: AugmentConfig,
    out_dtype=jnp.float32,
    fold_normalize: bool = False,
) -> jax.Array:
    """uint8 (B, H, W, C in {1,3}) -> normalized (B, out, out, 3), or the
    pre-normalize grayscale (B, out, out) with `fold_normalize` (pair with
    `norm_fold` on the model forward)."""
    return _augment_batch_impl(key, images, cfg, out_dtype, fold_normalize)


@functools.partial(
    jax.jit, static_argnames=("cfg", "out_dtype", "fold_normalize")
)
def dual_view_batch(
    key: jax.Array,
    images: jax.Array,
    cfg: AugmentConfig,
    out_dtype=jnp.float32,
    fold_normalize: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Two independent augmentation draws per image
    (DualViewTransform, ssp_vit2spn_tiny.py:75-82)."""
    k1, k2 = jax.random.split(key)
    v1 = _augment_batch_impl(k1, images, cfg, out_dtype, fold_normalize)
    v2 = _augment_batch_impl(k2, images, cfg, out_dtype, fold_normalize)
    return v1, v2
