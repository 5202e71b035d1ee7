"""Test configuration: force an 8-virtual-device CPU mesh so data-parallel /
collective paths are exercised without TPU hardware (SURVEY.md section 4).

Must run before any jax import in the test process.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ.setdefault("JAX_PLATFORMS", "cpu")
# structural kernel-parity tests compare the fused kernels against the exact
# XLA block at tight tolerances: pin the exact gelu there. The production
# default (fast rational gelu, ops/fused_block.py) is covered by the
# dedicated fast-vs-exact test, which sets this to "1" itself.
os.environ["VIT2SPN_FAST_GELU"] = "0"  # unconditional: a benching shell may export 1

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from vit2spn_tpu.core.config import (  # noqa: E402
    AugmentConfig,
    DataConfig,
    FineTuneConfig,
    SSPConfig,
    ViTConfig,
)


@pytest.fixture(scope="session")
def tiny_vit():
    return ViTConfig(
        image_size=32, patch_size=16, hidden_size=32, num_layers=2,
        num_heads=2, mlp_dim=64,
    )


@pytest.fixture(scope="session")
def tiny_data():
    return DataConfig(name="synthetic", augment=AugmentConfig(out_size=32))


@pytest.fixture(scope="session")
def tiny_ssp(tiny_vit, tiny_data):
    return SSPConfig(
        vit=tiny_vit, data=tiny_data, batch_size=8, accumulation_steps=2,
        pretrained_init=False, compute_dtype="float32",
    )


@pytest.fixture(scope="session")
def tiny_ft(tiny_vit, tiny_data):
    return FineTuneConfig(
        vit=tiny_vit, data=tiny_data, batch_size=8, epochs=2,
        compute_dtype="float32",
    )
