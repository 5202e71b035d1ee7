"""Projection / prediction / classifier heads.

Reference modules:
  * projection_head: Linear(384->1024) ReLU Dropout(.3) Linear(1024->128)
    (ssp_vit2spn_tiny.py:133-138; single-stream input 192 at
    dsn_ssn/ssp_single.py:113-118).
  * prediction_head: Linear(128->128) ReLU Linear(128->128)
    (ssp_vit2spn_tiny.py:139-143).
  * fine-tune fc: Linear(192->128) BatchNorm1d ReLU Dropout(.5)
    Linear(128->classes) (octmnist_ft_vit2spn.py:77-83).

Initialization follows torch.nn.Linear defaults (kaiming-uniform weights,
uniform bias in +-1/sqrt(fan_in)) so random-init training dynamics match.

BatchNorm under data parallelism: batch statistics are computed over the
global (sharded) batch dimension inside jit-with-shardings, so XLA inserts the
cross-replica all-reduce automatically — the GSPMD equivalent of the
SyncBatchNorm conversion the reference scaffolds (ssp_vit2spn_tiny.py:171).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _torch_linear_init(key, in_dim: int, out_dim: int):
    wk, bk = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(jnp.asarray(in_dim, jnp.float32))
    # torch kaiming_uniform_(a=sqrt(5)) on (out,in) == U(-1/sqrt(in), 1/sqrt(in))
    w = jax.random.uniform(wk, (in_dim, out_dim), minval=-bound, maxval=bound)
    b = jax.random.uniform(bk, (out_dim,), minval=-bound, maxval=bound)
    return {"w": w, "b": b}


def init_mlp_head(key, dims: Tuple[int, ...]) -> dict:
    """Stack of Linear layers with ReLU in between (used for projection and
    prediction heads)."""
    keys = jax.random.split(key, len(dims) - 1)
    return {
        f"linear_{i}": _torch_linear_init(keys[i], dims[i], dims[i + 1])
        for i in range(len(dims) - 1)
    }


def mlp_head_apply(
    params: dict,
    x: jax.Array,
    *,
    dropout_rate: float = 0.0,
    dropout_after_layer: int = -1,
    key: Optional[jax.Array] = None,
    train: bool = False,
) -> jax.Array:
    """Linear -> ReLU [-> Dropout] -> ... -> Linear (no activation on last)."""
    n = len(params)
    for i in range(n):
        p = params[f"linear_{i}"]
        x = x @ p["w"].astype(x.dtype) + p["b"].astype(x.dtype)
        if i < n - 1:
            x = jax.nn.relu(x)
            if train and dropout_rate > 0.0 and i == dropout_after_layer:
                keep = 1.0 - dropout_rate
                mask = jax.random.bernoulli(key, keep, x.shape)
                x = jnp.where(mask, x / keep, 0.0).astype(x.dtype)
    return x


def init_classifier_head(key, in_dim: int, hidden: int, num_classes: int) -> dict:
    """FineTunedModel.fc (octmnist_ft_vit2spn.py:77-83): params + BN state."""
    k1, k2 = jax.random.split(key)
    return {
        "linear_0": _torch_linear_init(k1, in_dim, hidden),
        "bn": {"scale": jnp.ones((hidden,)), "bias": jnp.zeros((hidden,))},
        "linear_1": _torch_linear_init(k2, hidden, num_classes),
    }


def init_bn_state(hidden: int) -> dict:
    return {
        "mean": jnp.zeros((hidden,)),
        "var": jnp.ones((hidden,)),
        "count": jnp.zeros((), jnp.int32),
    }


def classifier_head_apply(
    params: dict,
    bn_state: dict,
    x: jax.Array,
    *,
    dropout_rate: float = 0.5,
    key: Optional[jax.Array] = None,
    train: bool = False,
    bn_momentum: float = 0.1,
    bn_eps: float = 1e-5,
) -> Tuple[jax.Array, dict]:
    """Linear -> BatchNorm1d -> ReLU -> Dropout -> Linear.

    Returns (logits, new_bn_state). In train mode normalizes with batch stats
    (biased var) and updates running stats with torch's unbiased-var
    convention; in eval mode uses running stats.
    """
    p0 = params["linear_0"]
    x = x @ p0["w"].astype(x.dtype) + p0["b"].astype(x.dtype)

    x32 = x.astype(jnp.float32)
    if train:
        mean = jnp.mean(x32, axis=0)
        var = jnp.var(x32, axis=0)  # biased, used for normalization
        n = x32.shape[0]
        unbiased = var * n / max(n - 1, 1)
        new_state = {
            "mean": (1 - bn_momentum) * bn_state["mean"] + bn_momentum * mean,
            "var": (1 - bn_momentum) * bn_state["var"] + bn_momentum * unbiased,
            "count": bn_state["count"] + 1,
        }
    else:
        mean, var = bn_state["mean"], bn_state["var"]
        new_state = bn_state
    x32 = (x32 - mean) * jax.lax.rsqrt(var + bn_eps)
    x = (x32 * params["bn"]["scale"] + params["bn"]["bias"]).astype(x.dtype)

    x = jax.nn.relu(x)
    if train and dropout_rate > 0.0:
        keep = 1.0 - dropout_rate
        mask = jax.random.bernoulli(key, keep, x.shape)
        x = jnp.where(mask, x / keep, 0.0).astype(x.dtype)

    p1 = params["linear_1"]
    logits = x @ p1["w"].astype(x.dtype) + p1["b"].astype(x.dtype)
    return logits.astype(jnp.float32), new_state
