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


def test_shard_map_masked_tail_matches_gspmd(det_cfg):
    """The weight-masked partial accumulation group (ssp_vit2spn_tiny.py:215)
    must produce the SAME update in both dist modes: the shard_map path
    normalizes by the global (psum'd) weight sum, so a tail whose real
    samples land unevenly across shards still matches GSPMD exactly."""
    ds = synthetic_dataset(image_size=28, split_sizes={"train": 32}, seed=7)
    # eff = 16; 12 real samples + 4 weight-0 pads. The pads sit at the END of
    # the flat batch, so the 8 data shards hold UNEQUAL real-sample counts —
    # a per-shard mean would mis-normalize; the global denominator must not.
    batch = ds.images[:16]
    w = np.array([1.0] * 12 + [0.0] * 4, np.float32)
    key = jax.random.key(4)

    tr_g = SSPTrainer(det_cfg, logger=QUIET, dist_mode="gspmd")
    tr_s = SSPTrainer(det_cfg, logger=QUIET, dist_mode="shard_map")
    loss_g = float(tr_g.train_step(batch, key, w=w)["loss"])
    loss_s = float(tr_s.train_step(batch, key, w=w)["loss"])
    assert loss_s == pytest.approx(loss_g, abs=1e-5)

    p_g = jax.device_get(tr_g.state.params.online["patch_embed"]["kernel"])
    p_s = jax.device_get(tr_s.state.params.online["patch_embed"]["kernel"])
    np.testing.assert_allclose(p_s, p_g, atol=1e-5)

    # pad CONTENT must not influence the shard_map update
    batch_c = np.concatenate([ds.images[:12], ds.images[24:28]])
    tr_c = SSPTrainer(det_cfg, logger=QUIET, dist_mode="shard_map")
    loss_c = float(tr_c.train_step(batch_c, key, w=w)["loss"])
    assert loss_c == pytest.approx(loss_s, abs=1e-6)
    p_c = jax.device_get(tr_c.state.params.online["patch_embed"]["kernel"])
    np.testing.assert_allclose(p_c, p_s, atol=1e-6)


def test_shard_map_fit_trains_epoch_tail(det_cfg):
    """fit() no longer drops the epoch tail in shard_map mode: a 40-sample
    epoch at eff 16 trains all 40 (2 full steps + 1 masked tail step)."""
    import json
    import tempfile

    ds = synthetic_dataset(image_size=28, split_sizes={"train": 40}, seed=9)
    with tempfile.NamedTemporaryFile("r", suffix=".jsonl") as f:
        with MetricLogger(f.name, echo=False) as logger:
            tr = SSPTrainer(det_cfg, logger=logger, dist_mode="shard_map")
            tr.fit(ds, epochs=1)
        ev = [json.loads(l) for l in open(f.name)]
    ep = [e for e in ev if e["event"] == "ssp_epoch"][0]
    assert round(ep["images_per_sec"] * ep["seconds"]) == 40


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


def test_shard_map_refuses_tp_with_documented_error(det_cfg):
    """The DP-only asymmetry of shard_map mode is PERMANENT (PARITY.md
    deviation 11): TP is served by the GSPMD path, and requesting both must
    fail loudly with the pointer, not NotImplementedError."""
    from vit2spn_tpu.core.config import MeshConfig

    cfg = dataclasses.replace(
        det_cfg, mesh=MeshConfig(model_parallel=2)
    )
    with pytest.raises(ValueError, match="PARITY.md"):
        SSPTrainer(cfg, logger=QUIET, dist_mode="shard_map")
