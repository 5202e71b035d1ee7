"""Numerical parity with HF transformers ViTModel.

Builds a RANDOM-INIT HF ViT-Tiny offline from ViTConfig (no download needed),
converts its state dict with models.hf_convert, and checks our functional
forward reproduces torch's outputs — including the critical feature semantics:
`hidden_states[-1].mean(dim=1)` is the PRE-final-layernorm mean
(ssp_vit2spn_tiny.py:116-117).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from vit2spn_tpu.core.config import ViTConfig  # noqa: E402
from vit2spn_tpu.models.hf_convert import convert_hf_state_dict  # noqa: E402
from vit2spn_tpu.models.vit import vit_features, vit_forward  # noqa: E402


@pytest.fixture(scope="module")
def hf_pair():
    cfg = ViTConfig(image_size=32, patch_size=16, hidden_size=24,
                    num_layers=2, num_heads=2, mlp_dim=48)
    hf_cfg = transformers.ViTConfig(
        hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        intermediate_size=cfg.mlp_dim,
        patch_size=cfg.patch_size,
        image_size=cfg.image_size,
        output_hidden_states=True,
    )
    torch.manual_seed(0)
    model = transformers.ViTModel(hf_cfg)
    model.eval()
    state = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = convert_hf_state_dict(state, cfg)
    return cfg, model, params


def test_forward_parity(hf_pair):
    cfg, model, params = hf_pair
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, cfg.image_size, cfg.image_size, 3)).astype(np.float32)

    with torch.no_grad():
        out = model(torch.tensor(x.transpose(0, 3, 1, 2)))
    ref_pre_ln = out.hidden_states[-1].numpy()
    ref_last = out.last_hidden_state.numpy()

    ours = vit_forward(params, jnp.asarray(x), cfg)
    np.testing.assert_allclose(
        np.asarray(ours["pre_ln"]), ref_pre_ln, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(ours["last_hidden_state"]), ref_last, atol=2e-5
    )


def test_feature_semantics_parity(hf_pair):
    """The exact ViTBackbone.forward: hidden_states[-1].mean(dim=1)."""
    cfg, model, params = hf_pair
    rng = np.random.default_rng(1)
    x = rng.normal(size=(3, cfg.image_size, cfg.image_size, 3)).astype(np.float32)
    with torch.no_grad():
        out = model(torch.tensor(x.transpose(0, 3, 1, 2)))
    ref_feats = out.hidden_states[-1].mean(dim=1).numpy()
    ours = vit_features(params, jnp.asarray(x), cfg)
    np.testing.assert_allclose(np.asarray(ours), ref_feats, atol=2e-5)
    # and it must DIFFER from the post-layernorm pooling (catching the silent
    # last_hidden_state vs hidden_states[-1] mixup SURVEY.md warns about)
    ref_wrong = out.last_hidden_state.mean(dim=1).numpy()
    assert np.abs(ref_feats - ref_wrong).max() > 1e-3


def test_convert_rejects_wrong_geometry(hf_pair):
    """A weight file at one geometry must NOT 'convert' at another: the
    patch-embed reshape and most leaf copies succeed silently at a wrong
    hidden size and crash (broadcast error) deep inside training instead —
    found live by a full-geometry ViT-Tiny stand-in fed to a
    --shrink-geometry parity run."""
    cfg, model, _ = hf_pair
    state = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    import dataclasses

    for wrong in (
        dataclasses.replace(cfg, hidden_size=48, num_heads=4),
        dataclasses.replace(cfg, mlp_dim=96),
        dataclasses.replace(cfg, image_size=64),  # pos_embed length
    ):
        with pytest.raises(ValueError, match="geometry"):
            convert_hf_state_dict(state, wrong)
    # more requested layers than the file has -> KeyError is fine too; the
    # availability probe treats any raise as "unavailable at this geometry"
    with pytest.raises((ValueError, KeyError)):
        convert_hf_state_dict(
            state, dataclasses.replace(cfg, num_layers=4)
        )
    # FEWER requested layers than the file has must raise too — the loop
    # reads only the first L layers and every shape check then passes, so
    # without the explicit depth check a deeper file truncates silently
    with pytest.raises(ValueError, match="geometry"):
        convert_hf_state_dict(
            state, dataclasses.replace(cfg, num_layers=1)
        )


def test_local_weight_file_loading(hf_pair, tmp_path, monkeypatch):
    """Real-data readiness: load_pretrained_vit_tiny must accept a local
    .safetensors or .npz state-dict file (and $VIT2SPN_VIT_TINY_PATH), so
    dropping weights on disk activates the ImageNet-init protocols."""
    import jax

    from vit2spn_tpu.models.hf_convert import (
        load_local_state,
        load_pretrained_vit_tiny,
        read_safetensors,
    )

    cfg, model, params = hf_pair
    state = {k: v.detach().numpy() for k, v in model.state_dict().items()}

    # .npz route (with a vit.-prefixed dict, as classification checkpoints use)
    npz_path = str(tmp_path / "w.npz")
    np.savez(npz_path, **{f"vit.{k}": v for k, v in state.items()})
    got = load_pretrained_vit_tiny(cfg, path=npz_path)
    for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # .safetensors route through the dependency-free reader
    st = pytest.importorskip("safetensors.numpy")
    st_path = str(tmp_path / "w.safetensors")
    st.save_file({k: np.ascontiguousarray(v) for k, v in state.items()}, st_path)
    raw = read_safetensors(st_path)
    assert set(raw) == set(state)
    for k in state:
        np.testing.assert_array_equal(raw[k], state[k])
    got2 = load_pretrained_vit_tiny(cfg, path=st_path)
    for a, b in zip(jax.tree.leaves(got2), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # bf16 widening in the raw reader
    bf = torch.randn(3, 5).to(torch.bfloat16)
    st_path2 = str(tmp_path / "bf.safetensors")
    from safetensors.torch import save_file as save_torch

    save_torch({"x": bf}, st_path2)
    out = read_safetensors(st_path2)["x"]
    np.testing.assert_allclose(out, bf.float().numpy(), rtol=0, atol=0)

    # env-var route
    monkeypatch.setenv("VIT2SPN_VIT_TINY_PATH", npz_path)
    got3 = load_pretrained_vit_tiny(cfg)
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(got3)[0]), np.asarray(jax.tree.leaves(params)[0])
    )
    assert load_local_state(npz_path)  # direct API also exposed


def test_inverse_conversion_roundtrip(hf_pair):
    """convert_to_hf_state_dict is the exact inverse of convert_hf_state_dict
    — every HF tensor survives a there-and-back round trip bit-exactly."""
    from vit2spn_tpu.models.hf_convert import convert_to_hf_state_dict

    cfg, model, params = hf_pair
    state = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    back = convert_to_hf_state_dict(params, cfg)
    assert set(back) == set(state)
    for k in state:
        np.testing.assert_array_equal(back[k], state[k].astype(np.float32))


def test_reference_pth_export_strict_load(hf_pair, tmp_path):
    """Our backbone export feeds the reference's fine-tune scripts: a
    ViTBackbone-shaped torch module (vit.-prefixed ViTModel, matching
    octmnist_ft_vit2spn.py:63-71) loads the exported .pth with the default
    strict=True (:190), and its features match our forward."""
    from vit2spn_tpu.models.hf_convert import export_reference_pth

    cfg, model, params = hf_pair
    pth = str(tmp_path / "octmnist_vit2spn_tiny_model.pth")
    export_reference_pth(params, cfg, pth)

    class ViTBackbone(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.vit = transformers.ViTModel(model.config)

        def forward(self, x):
            return self.vit(x).hidden_states[-1].mean(dim=1)

    backbone = ViTBackbone()
    backbone.load_state_dict(torch.load(pth, weights_only=True))  # strict
    backbone.eval()

    rng = np.random.default_rng(7)
    x = rng.normal(size=(2, cfg.image_size, cfg.image_size, 3)).astype(np.float32)
    with torch.no_grad():
        ref = backbone(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    ours = vit_features(params, jnp.asarray(x), cfg)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5)


def test_reference_pth_ingestion(hf_pair, tmp_path):
    """Migration path: a reference user's existing .pth SSP export
    (vit.-prefixed torch state dict, ssp_vit2spn_tiny.py:246) loads through
    load_local_state/load_pretrained_vit_tiny into our param tree."""
    import jax

    from vit2spn_tpu.models.hf_convert import load_pretrained_vit_tiny

    cfg, model, params = hf_pair
    pth = str(tmp_path / "ref_export.pth")
    torch.save(
        {f"vit.{k}": v for k, v in model.state_dict().items()}, pth
    )
    got = load_pretrained_vit_tiny(cfg, path=pth)
    for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
