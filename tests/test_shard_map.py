"""Explicit shard_map+psum data parallelism vs the GSPMD path.

With all stochastic ops disabled (identity augmentation, no projection-head
dropout) the two formulations compute the same mathematical step, so loss
and updated params must agree to fp tolerance.
"""

import dataclasses

import jax
import numpy as np
import pytest

from vit2spn_tpu.core.config import AugmentConfig, DataConfig, SSPConfig, ViTConfig
from vit2spn_tpu.data.datasets import synthetic_dataset
from vit2spn_tpu.train.ssp import SSPTrainer
from vit2spn_tpu.utils.logging import MetricLogger

QUIET = MetricLogger(echo=False)


@pytest.fixture(scope="module")
def det_cfg():
    return SSPConfig(
        vit=ViTConfig(image_size=32, patch_size=16, hidden_size=32,
                      num_layers=2, num_heads=2, mlp_dim=64),
        data=DataConfig(
            name="synthetic",
            augment=AugmentConfig(out_size=32, enabled=False),
        ),
        batch_size=8,
        accumulation_steps=2,
        pretrained_init=False,
        proj_dropout=0.0,
        compute_dtype="float32",
    )


def test_shard_map_matches_gspmd(det_cfg):
    ds = synthetic_dataset(image_size=28, split_sizes={"train": 16})
    batch = ds.images[:16]
    key = jax.random.key(0)

    tr_g = SSPTrainer(det_cfg, logger=QUIET, dist_mode="gspmd")
    tr_s = SSPTrainer(det_cfg, logger=QUIET, dist_mode="shard_map")
    loss_g = float(tr_g.train_step(batch, key)["loss"])
    loss_s = float(tr_s.train_step(batch, key)["loss"])
    assert loss_s == pytest.approx(loss_g, abs=1e-5)

    p_g = jax.device_get(tr_g.state.params.online["patch_embed"]["kernel"])
    p_s = jax.device_get(tr_s.state.params.online["patch_embed"]["kernel"])
    np.testing.assert_allclose(p_s, p_g, atol=1e-5)


def test_shard_map_trains(det_cfg):
    cfg = dataclasses.replace(
        det_cfg,
        data=DataConfig(name="synthetic", augment=AugmentConfig(out_size=32)),
        proj_dropout=0.3,
    )
    ds = synthetic_dataset(image_size=28, split_sizes={"train": 64})
    tr = SSPTrainer(cfg, logger=QUIET, dist_mode="shard_map")
    hist = tr.fit(ds, epochs=3)
    assert np.isfinite(hist).all()
    assert hist[-1] < hist[0]
