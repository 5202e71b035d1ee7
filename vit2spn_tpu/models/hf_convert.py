"""HF `transformers` ViT checkpoint -> our param pytree.

The reference initializes every backbone from
`ViTModel.from_pretrained("WinKawaks/vit-tiny-patch16-224")`
(ssp_vit2spn_tiny.py:112, octmnist_ft_vit2spn.py:66). This converter maps an
HF ViTModel state dict onto vit2spn_tpu.models.vit's layout:

  * per-layer q/k/v Linears -> one fused wqkv (concat on the output dim);
  * torch Linear weights (out, in) -> transposed (in, out);
  * patch-embed conv kernel (D, C, P, P) -> (P*P*C, D) matmul kernel with
    (ph, pw, c) flatten order matching models.vit.patchify;
  * 12 per-layer tensors stacked on a leading layer axis for lax.scan.

Conversion is validated against a torch-executed HF ViTModel in
tests/test_hf_parity.py (random-init HF model built offline from ViTConfig).
In this build environment the pretrained checkpoint itself is not downloadable
(no network egress); `load_pretrained_vit_tiny` uses the local HF cache only
and raises if absent — callers fall back to random init with a warning.
"""

from __future__ import annotations

import numpy as np

from vit2spn_tpu.core.config import ViTConfig


def convert_hf_state_dict(state: dict, cfg: ViTConfig) -> dict:
    """`state`: HF ViTModel state_dict mapping names -> numpy arrays."""

    def get(name):
        return np.asarray(state[name])

    def linear(prefix):  # torch (out, in) -> (in, out)
        return get(prefix + ".weight").T, get(prefix + ".bias")

    d = cfg.hidden_size
    # conv kernel (D, C, P, P) -> (P, P, C, D) -> (P*P*C, D); patchify
    # flattens (ph, pw, c), so transpose to (ph, pw, c, d)
    conv = get("embeddings.patch_embeddings.projection.weight")
    kernel = conv.transpose(2, 3, 1, 0).reshape(-1, d)

    blocks = {k: [] for k in (
        "ln1_scale", "ln1_bias", "wqkv", "bqkv", "wo", "bo",
        "ln2_scale", "ln2_bias", "w1", "b1", "w2", "b2",
    )}
    for i in range(cfg.num_layers):
        p = f"encoder.layer.{i}"
        wq, bq = linear(f"{p}.attention.attention.query")
        wk, bk = linear(f"{p}.attention.attention.key")
        wv, bv = linear(f"{p}.attention.attention.value")
        wo, bo = linear(f"{p}.attention.output.dense")
        w1, b1 = linear(f"{p}.intermediate.dense")
        w2, b2 = linear(f"{p}.output.dense")
        blocks["ln1_scale"].append(get(f"{p}.layernorm_before.weight"))
        blocks["ln1_bias"].append(get(f"{p}.layernorm_before.bias"))
        blocks["wqkv"].append(np.concatenate([wq, wk, wv], axis=1))
        blocks["bqkv"].append(np.concatenate([bq, bk, bv]))
        blocks["wo"].append(wo)
        blocks["bo"].append(bo)
        blocks["ln2_scale"].append(get(f"{p}.layernorm_after.weight"))
        blocks["ln2_bias"].append(get(f"{p}.layernorm_after.bias"))
        blocks["w1"].append(w1)
        blocks["b1"].append(b1)
        blocks["w2"].append(w2)
        blocks["b2"].append(b2)

    params = {
        "patch_embed": {
            "kernel": kernel,
            "bias": get("embeddings.patch_embeddings.projection.bias"),
        },
        "cls_token": get("embeddings.cls_token"),
        "pos_embed": get("embeddings.position_embeddings"),
        "final_ln": {
            "scale": get("layernorm.weight"),
            "bias": get("layernorm.bias"),
        },
        "blocks": {k: np.stack(v) for k, v in blocks.items()},
    }
    if "pooler.dense.weight" in state:
        pw, pb = linear("pooler.dense")
        params["pooler"] = {"w": pw, "b": pb}
    else:  # keep structure stable for checkpoint round-trips
        params["pooler"] = {
            "w": np.zeros((d, d), np.float32),
            "b": np.zeros((d,), np.float32),
        }
    return {k: _to_f32(v) for k, v in params.items()}


def _to_f32(tree):
    if isinstance(tree, dict):
        return {k: _to_f32(v) for k, v in tree.items()}
    return np.asarray(tree, dtype=np.float32)


def load_pretrained_vit_tiny(
    cfg: ViTConfig, model_name: str = "WinKawaks/vit-tiny-patch16-224"
) -> dict:
    """Local-cache-only load of the HF checkpoint + conversion."""
    from transformers import ViTModel  # lazy: torch is heavy

    model = ViTModel.from_pretrained(model_name, local_files_only=True)
    state = {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
    return convert_hf_state_dict(state, cfg)
