import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit2spn_tpu.ops.attention import mha_xla
from vit2spn_tpu.ops.flash_attention import mha_pallas


@pytest.fixture(scope="module")
def qkv():
    ks = jax.random.split(jax.random.key(0), 3)
    shape = (2, 197, 3, 64)  # ViT-Tiny: S=197 (non-tile-aligned), 3 heads
    return tuple(jax.random.normal(k, shape) for k in ks)


def test_pallas_forward_matches_xla(qkv):
    q, k, v = qkv
    ref = mha_xla(q, k, v)
    out = mha_pallas(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_pallas_grads_match_xla(qkv):
    q, k, v = qkv

    def loss(fn):
        return lambda q, k, v: jnp.sum(fn(q, k, v) ** 2)

    g_ref = jax.grad(loss(mha_xla), argnums=(0, 1, 2))(q, k, v)
    g_pl = jax.grad(
        loss(lambda q, k, v: mha_pallas(q, k, v, interpret=True)),
        argnums=(0, 1, 2),
    )(q, k, v)
    for a, b in zip(g_ref, g_pl):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-5)


def test_softmax_rows_sum_to_one_under_padding():
    """Padded key columns must not leak probability mass."""
    ks = jax.random.split(jax.random.key(1), 3)
    q, k, v = (jax.random.normal(kk, (1, 5, 1, 64)) for kk in ks)
    # with v == ones, output rows must be exactly 1 if softmax is normalized
    ones = jnp.ones_like(v)
    out = mha_pallas(q, k, ones, interpret=True)
    np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-5)
