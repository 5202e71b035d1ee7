"""Fused Pallas block kernel vs the XLA block (interpret mode on CPU)."""


import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit2spn_tpu.core.config import ViTConfig
from vit2spn_tpu.models.vit import _block, init_vit
from vit2spn_tpu.ops.fused_block import WEIGHT_NAMES, fused_block

CFG = ViTConfig(image_size=32, patch_size=16, hidden_size=64, num_layers=1,
                num_heads=2, mlp_dim=128)
EPS = CFG.layernorm_eps


def _layer_weights(key):
    params = init_vit(key, CFG)
    lp = jax.tree.map(lambda a: a[0], params["blocks"])
    # nonzero LN biases / random scales to exercise those grads
    k1, k2 = jax.random.split(key)
    lp["ln1_scale"] = 1.0 + 0.1 * jax.random.normal(k1, lp["ln1_scale"].shape)
    lp["ln2_bias"] = 0.1 * jax.random.normal(k2, lp["ln2_bias"].shape)
    return lp


def _as_tuple(lp):
    return tuple(lp[name] for name in WEIGHT_NAMES)


@pytest.fixture(scope="module")
def setup():
    lp = _layer_weights(jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (4, CFG.seq_len, CFG.hidden_size))
    return lp, x


def test_forward_matches_xla_block(setup):
    lp, x = setup
    ref = _block(CFG, "xla", x, lp)
    out = fused_block(x, _as_tuple(lp), CFG.num_heads, EPS, 2, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_forward_odd_batch_tile(setup):
    lp, x = setup
    ref = _block(CFG, "xla", x, lp)
    # block_images=8 > B=4 -> falls back to bt=4; also try bt that divides
    out = fused_block(x, _as_tuple(lp), CFG.num_heads, EPS, 8, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_grads_match_xla_block(setup):
    lp, x = setup
    wt = _as_tuple(lp)

    def loss_ref(x, wt):
        lpx = dict(zip(WEIGHT_NAMES, wt))
        return jnp.sum(jnp.sin(_block(CFG, "xla", x, lpx)))

    def loss_fused(x, wt):
        return jnp.sum(jnp.sin(fused_block(x, wt, CFG.num_heads, EPS, 2, True)))

    gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(x, wt)
    gx_f, gw_f = jax.grad(loss_fused, argnums=(0, 1))(x, wt)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                               atol=5e-4, rtol=1e-3)
    for name, a, b in zip(WEIGHT_NAMES, gw_f, gw_r):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=2e-3,
            err_msg=f"grad mismatch for {name}",
        )


def test_fused_block_generalizes_to_vit_small_dims():
    """Kernel is dimension-generic: ViT-Small geometry (D=384, 6 heads,
    mlp 1536) through the same code path (interpret mode)."""
    cfg = ViTConfig(image_size=32, patch_size=16, hidden_size=384,
                    num_layers=1, num_heads=6, mlp_dim=1536)
    params = init_vit(jax.random.key(3), cfg)
    lp = jax.tree.map(lambda a: a[0], params["blocks"])
    x = jax.random.normal(jax.random.key(4), (2, cfg.seq_len, cfg.hidden_size))
    ref = _block(cfg, "xla", x, lp)
    out = fused_block(x, _as_tuple(lp), cfg.num_heads, cfg.layernorm_eps, 2, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-4)


def test_mem_scale_tiny_baseline_and_growth():
    """Tile/VMEM defaults are tuned at the ViT-Tiny point (scale must be
    EXACTLY 1 there so production defaults never shift) and scale with the
    geometry: ViT-Small is exactly 2x, ViT-Base 4x."""
    from vit2spn_tpu.ops.fused_block import _mem_scale

    assert _mem_scale(208, 192, 768, 3) == 1  # Tiny @ sp=208 (S=197)
    assert _mem_scale(208, 384, 1536, 6) == 2  # Small
    assert _mem_scale(208, 768, 3072, 12) == 4  # Base
    # small test geometries must not divide tiles below usable
    assert _mem_scale(48, 64, 128, 2) == 1


def test_bench_step_gflops_analytic():
    """bench.py's analytic step FLOPs: the Tiny figure must reproduce the
    canonical decomposition — 8 forward-equivalents of 2.51 GFLOP (= the
    published fvcore 2.16 GFLOP + the attention einsums fvcore skips)."""
    import bench

    g_tiny = bench._step_gflops_per_img(ViTConfig())
    assert abs(g_tiny - 20.05) < 0.1
    g_small = bench._step_gflops_per_img(ViTConfig.small())
    assert abs(g_small - 73.58) < 0.1


def _stack_weights(key, layers=3):
    cfg = ViTConfig(image_size=32, patch_size=16, hidden_size=64,
                    num_layers=layers, num_heads=2, mlp_dim=128)
    params = init_vit(key, cfg)
    blocks = params["blocks"]
    k1, k2 = jax.random.split(key)
    blocks["ln1_scale"] = 1.0 + 0.1 * jax.random.normal(
        k1, blocks["ln1_scale"].shape
    )
    blocks["ln2_bias"] = 0.1 * jax.random.normal(k2, blocks["ln2_bias"].shape)
    return cfg, blocks


def test_backbone_forward_matches_per_layer():
    """Whole-backbone single-grid kernel == per-layer scan of XLA blocks."""
    from vit2spn_tpu.ops.fused_block import fused_backbone

    cfg, blocks = _stack_weights(jax.random.key(5))
    x = jax.random.normal(jax.random.key(6), (4, cfg.seq_len, cfg.hidden_size))
    ref = x
    for l in range(cfg.num_layers):
        ref = _block(cfg, "xla", ref, jax.tree.map(lambda a: a[l], blocks))
    wt = tuple(blocks[n] for n in WEIGHT_NAMES)
    out = fused_backbone(x, wt, cfg.num_heads, cfg.layernorm_eps, 2, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-4)


def test_backbone_grads_match_per_layer():
    from vit2spn_tpu.ops.fused_block import fused_backbone

    cfg, blocks = _stack_weights(jax.random.key(7), layers=2)
    x = jax.random.normal(jax.random.key(8), (4, cfg.seq_len, cfg.hidden_size))
    wt = tuple(blocks[n] for n in WEIGHT_NAMES)

    def loss_ref(x, wt):
        b = dict(zip(WEIGHT_NAMES, wt))
        h = x
        for l in range(cfg.num_layers):
            h = _block(cfg, "xla", h, jax.tree.map(lambda a: a[l], b))
        return jnp.sum(jnp.sin(h))

    def loss_fused(x, wt):
        return jnp.sum(jnp.sin(
            fused_backbone(x, wt, cfg.num_heads, cfg.layernorm_eps, 2, True)
        ))

    gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(x, wt)
    gx_f, gw_f = jax.grad(loss_fused, argnums=(0, 1))(x, wt)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                               atol=5e-4, rtol=1e-3)
    for name, a, b in zip(WEIGHT_NAMES, gw_f, gw_r):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=2e-3,
            err_msg=f"stacked grad mismatch for {name}",
        )


def test_backbone_grads_at_vit_small_dims(monkeypatch):
    """Backward parity through the GEOMETRY-SCALED tile/budget branches:
    fused_backbone grads == per-layer XLA at D=384/6 heads/mlp 1536, one
    layer, interpret mode. At toy sequence lengths _mem_scale is 1 (it
    scales with sp too), so pin it to 2 — exactly ViT-Small's production
    value — to execute the scale>1 tile-division and byte-computed-budget
    code (budgets are inert in interpret mode; the tiles are not)."""
    import sys

    from vit2spn_tpu.ops.fused_block import fused_backbone

    # NOTE: `import ...fused_block as m` would bind the re-exported FUNCTION
    # (package __init__ shadows the submodule for `as` bindings)
    _fb_mod = sys.modules["vit2spn_tpu.ops.fused_block"]
    monkeypatch.setattr(_fb_mod, "_mem_scale", lambda *a: 2)

    cfg = ViTConfig(image_size=32, patch_size=16, hidden_size=384,
                    num_layers=1, num_heads=6, mlp_dim=1536)
    params = init_vit(jax.random.key(9), cfg)
    blocks = params["blocks"]
    x = jax.random.normal(jax.random.key(10), (2, cfg.seq_len, cfg.hidden_size))
    wt = tuple(blocks[n] for n in WEIGHT_NAMES)

    def loss_ref(x, wt):
        b = dict(zip(WEIGHT_NAMES, wt))
        h = _block(cfg, "xla", x, jax.tree.map(lambda a: a[0], b))
        return jnp.sum(jnp.sin(h))

    def loss_fused(x, wt):
        return jnp.sum(jnp.sin(
            fused_backbone(x, wt, cfg.num_heads, cfg.layernorm_eps, 2, True)
        ))

    gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(x, wt)
    gx_f, gw_f = jax.grad(loss_fused, argnums=(0, 1))(x, wt)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                               atol=1e-3, rtol=2e-3)
    for name, a, b in zip(WEIGHT_NAMES, gw_f, gw_r):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-3, rtol=5e-3,
            err_msg=f"vit-small grad mismatch for {name}",
        )


def test_fast_gelu_matches_exact(setup, monkeypatch):
    """VIT2SPN_FAST_GELU swaps the in-kernel erf/gelu-grad transcendentals
    for exp-free rational approximations (tools/fit_gelu_rational.py).
    Approximation error is orders below bf16 resolution: fwd and grads must
    match the exact path within bf16-level tolerances."""
    import sys

    fb_mod = sys.modules["vit2spn_tpu.ops.fused_block"]
    lp, x = setup
    wt = _as_tuple(lp)

    def loss(x, wt):
        return jnp.sum(jnp.sin(fused_block(x, wt, CFG.num_heads, EPS, 2, True)))

    monkeypatch.setenv("VIT2SPN_FAST_GELU", "0")
    l0, (gx0, gw0) = jax.value_and_grad(loss, argnums=(0, 1))(x, wt)
    monkeypatch.setenv("VIT2SPN_FAST_GELU", "1")
    l1, (gx1, gw1) = jax.value_and_grad(loss, argnums=(0, 1))(x, wt)

    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-3)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx0),
                               atol=5e-3, rtol=5e-3)
    for name, a, b in zip(WEIGHT_NAMES, gw1, gw0):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-2, rtol=5e-3,
            err_msg=f"fast-gelu grad mismatch for {name}",
        )

    # direct approximation-quality pins (float64 reference)
    from math import erf as pyerf

    xs = np.linspace(-8.0, 8.0, 20001)
    ref = xs * 0.5 * (1.0 + np.array([pyerf(v / np.sqrt(2)) for v in xs]))
    got = np.asarray(fb_mod._gelu_fast(jnp.asarray(xs)))
    assert np.abs(got - ref).max() < 1e-4
    gref = (
        0.5 * (1.0 + np.array([pyerf(v / np.sqrt(2)) for v in xs]))
        + xs * np.exp(-xs * xs / 2) / np.sqrt(2 * np.pi)
    )
    ggot = np.asarray(fb_mod._gelu_grad_fast(jnp.asarray(xs)))
    assert np.abs(ggot - gref).max() < 1e-4
