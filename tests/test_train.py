import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit2spn_tpu.data.datasets import synthetic_dataset
from vit2spn_tpu.models.vit import init_vit
from vit2spn_tpu.train import checkpoint as ckpt
from vit2spn_tpu.train.finetune import FineTuneTrainer, weighted_cross_entropy
from vit2spn_tpu.train.optim import (
    EarlyStopping,
    ReduceLROnPlateau,
    balanced_class_weights,
)
from vit2spn_tpu.train.ssp import SSPTrainer
from vit2spn_tpu.utils.logging import MetricLogger


QUIET = MetricLogger(echo=False)


def test_ssp_loss_decreases(tiny_ssp):
    ds = synthetic_dataset(image_size=28, split_sizes={"train": 64})
    tr = SSPTrainer(tiny_ssp, logger=QUIET)
    hist = tr.fit(ds, epochs=4)
    assert hist[-1] < hist[0]  # cosine alignment improves (toward -1)


def test_ssp_ema_moves_target(tiny_ssp):
    ds = synthetic_dataset(image_size=28, split_sizes={"train": 32})
    tr = SSPTrainer(tiny_ssp, logger=QUIET)
    t_before = np.asarray(jax.tree.leaves(jax.device_get(tr.state.params.target))[3])
    tr.fit(ds, epochs=1)
    t_after = np.asarray(jax.tree.leaves(jax.device_get(tr.state.params.target))[3])
    assert not np.array_equal(t_before, t_after)


def test_ssp_checkpoint_resume(tiny_ssp, tmp_path):
    cfg = dataclasses.replace(tiny_ssp, checkpoint_every_epochs=1)
    ds = synthetic_dataset(image_size=28, split_sizes={"train": 32})
    path = str(tmp_path / "ckpt.npz")
    tr = SSPTrainer(cfg, logger=QUIET)
    tr.fit(ds, epochs=2, checkpoint_path=path)
    step_after_2 = int(jax.device_get(tr.state.step))

    tr2 = SSPTrainer(cfg, logger=QUIET)
    tr2.fit(ds, epochs=3, checkpoint_path=path)  # resumes at epoch 2
    assert int(jax.device_get(tr2.state.step)) == step_after_2 + 2  # 1 extra epoch (2 steps/epoch... )


def test_ssp_resume_adopts_checkpoint_provenance(tiny_ssp, tmp_path):
    """The restored state replaces the fresh init, so fit() adopts the
    checkpoint's recorded lineage — a random-lineage checkpoint must not
    ride a later 'pretrained' construction past the parity runbook's
    provenance gate (evals/parity.py)."""
    cfg = dataclasses.replace(tiny_ssp, checkpoint_every_epochs=1)
    ds = synthetic_dataset(image_size=28, split_sizes={"train": 32})
    path = str(tmp_path / "ckpt.npz")
    tr = SSPTrainer(cfg, logger=QUIET)
    assert tr.init_provenance == "random"
    hist = tr.fit(ds, epochs=1, checkpoint_path=path)
    assert ckpt.metadata(path)["init_provenance"] == "random"

    tr2 = SSPTrainer(cfg, logger=QUIET)
    tr2.init_provenance = "pretrained"  # simulate a successful weight ingest
    resumed = tr2.fit(ds, epochs=1, checkpoint_path=path)  # resume past end
    assert tr2.init_provenance == "random"  # checkpoint lineage wins
    assert resumed == []
    assert tr2.fit_resume_epoch == 1
    assert tr2.fit_resume_loss == pytest.approx(hist[-1])

    # pre-provenance-field checkpoints cannot prove their lineage
    ckpt.save(path, jax.device_get(tr.state),
              {"epoch": 1, "loss": float(hist[-1])})
    tr3 = SSPTrainer(cfg, logger=QUIET)
    tr3.init_provenance = "pretrained"
    tr3.fit(ds, epochs=1, checkpoint_path=path)
    assert tr3.init_provenance == "resume_unverified"


def test_checkpoint_compatible_mirrors_strict_restore(tiny_ssp, tmp_path):
    """compatible() returns None exactly when a strict restore would
    succeed, and a reason string otherwise — without touching device
    values (the parity runbook pre-checks foreign checkpoints with it)."""
    tr = SSPTrainer(tiny_ssp, logger=QUIET)
    path = str(tmp_path / "ckpt.npz")
    ckpt.save(path, jax.device_get(tr.state), {"epoch": 0})
    assert ckpt.compatible(path, tr.state) is None

    other_cfg = dataclasses.replace(
        tiny_ssp,
        vit=dataclasses.replace(tiny_ssp.vit, hidden_size=16, num_heads=2),
    )
    other = SSPTrainer(other_cfg, logger=QUIET)
    reason = ckpt.compatible(path, other.state)
    assert reason is not None and "incompatible" in reason
    with pytest.raises(Exception):
        ckpt.restore(path, other.state)  # what compatible() predicts


def test_export_restore_roundtrip(tiny_ssp, tmp_path):
    ds = synthetic_dataset(image_size=28, split_sizes={"train": 32})
    tr = SSPTrainer(tiny_ssp, logger=QUIET)
    tr.fit(ds, epochs=1)
    path = tr.export_backbone(str(tmp_path / "backbone.npz"))
    template = init_vit(jax.random.key(0), tiny_ssp.vit)
    restored = ckpt.restore(path, template)
    from vit2spn_tpu.models.ssp import backbone_slice

    want = jax.device_get(backbone_slice(tr.state.params.online, 0))
    got_leaves = jax.tree.leaves(restored)
    want_leaves = jax.tree.leaves(want)
    for a, b in zip(got_leaves, want_leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_finetune_overfits_tiny_set(tiny_ft):
    from vit2spn_tpu.core.config import AugmentConfig, DataConfig

    # identity augs: this test checks the optimization machinery, not whether
    # a 2-layer/32-dim ViT can see through the full strong-augment stack
    cfg = dataclasses.replace(
        tiny_ft, epochs=15, use_early_stop=False, use_scheduler=False,
        learning_rate=3e-4,
        data=DataConfig(name="synthetic",
                        augment=AugmentConfig(out_size=32, enabled=False)),
    )
    tr_ds = synthetic_dataset(image_size=28, split_sizes={"train": 64}, seed=3)
    w = balanced_class_weights(tr_ds.labels, 4)
    tr = FineTuneTrainer(cfg, num_classes=4, logger=QUIET, eval_augment=False)
    tr.fit(tr_ds, tr_ds, w)
    loss, probs, labels = tr.evaluate(tr_ds, w)
    acc = (probs.argmax(-1) == labels).mean()
    assert acc > 0.5  # 4 classes, random = 0.25


def test_weighted_ce_matches_torch_semantics():
    torch = pytest.importorskip("torch")
    logits = np.random.default_rng(0).normal(size=(16, 4)).astype(np.float32)
    labels = np.random.default_rng(1).integers(0, 4, 16)
    weights = np.array([0.5, 2.0, 1.0, 3.0], np.float32)
    ours = float(
        weighted_cross_entropy(
            jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(weights)
        )
    )
    ref = torch.nn.CrossEntropyLoss(weight=torch.tensor(weights))(
        torch.tensor(logits), torch.tensor(labels)
    ).item()
    assert ours == pytest.approx(ref, rel=1e-5)


def test_reduce_lr_on_plateau_torch_semantics():
    s = ReduceLROnPlateau(factor=0.1, patience=2)
    # improving: no drop
    assert s.step(1.0) == 1.0
    assert s.step(0.9) == 1.0
    # plateau: drops on the (patience+1)-th bad epoch
    assert s.step(0.95) == 1.0  # bad 1
    assert s.step(0.95) == 1.0  # bad 2
    assert s.step(0.95) == pytest.approx(0.1)  # bad 3 -> drop
    # counter resets after drop
    assert s.step(0.95) == pytest.approx(0.1)


def test_early_stopping_restores_best():
    st = EarlyStopping(patience=2)
    assert not st.step(1.0, "state_a")
    assert not st.step(0.5, "state_b")  # best
    assert not st.step(0.6, "x")
    assert st.step(0.7, "y")  # second bad epoch -> stop
    assert st.best_state == "state_b"
    assert st.best == 0.5


def test_balanced_class_weights_matches_sklearn():
    sklearn = pytest.importorskip("sklearn.utils.class_weight")
    labels = np.array([0, 0, 0, 1, 1, 2])
    ours = balanced_class_weights(labels, 3)
    ref = sklearn.compute_class_weight(
        class_weight="balanced", classes=np.unique(labels), y=labels
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_checkpoint_strict_false_tolerates_missing(tmp_path):
    tree = {"a": np.ones(3), "b": np.zeros(2)}
    path = str(tmp_path / "c.npz")
    ckpt.save(path, {"a": np.full(3, 5.0)}, {"note": 1})
    with pytest.raises(KeyError):
        ckpt.restore(path, tree, strict=True)
    out = ckpt.restore(path, tree, strict=False)
    np.testing.assert_array_equal(out["a"], np.full(3, 5.0))
    np.testing.assert_array_equal(out["b"], np.zeros(2))
    assert ckpt.metadata(path)["note"] == 1


def test_epoch_scan_matches_stepwise(tiny_ssp):
    """The whole-epoch lax.scan dispatch must produce exactly the same
    states/losses as step-by-step dispatch."""
    import jax.numpy as jnp

    ds = synthetic_dataset(image_size=28, split_sizes={"train": 64})
    idx_mat = np.arange(64).reshape(4, 16)

    tr_a = SSPTrainer(tiny_ssp, logger=QUIET)
    assert tr_a.attach_dataset(ds.images)
    keys = jax.vmap(lambda s: jax.random.fold_in(jax.random.key(9), s))(
        jnp.arange(4)
    )
    losses_a = np.asarray(tr_a.train_epoch(idx_mat, keys)["loss"])

    tr_b = SSPTrainer(tiny_ssp, logger=QUIET)
    assert tr_b.attach_dataset(ds.images)
    losses_b = [
        float(tr_b.train_step_indices(idx_mat[i], jax.random.fold_in(jax.random.key(9), i))["loss"])
        for i in range(4)
    ]
    np.testing.assert_allclose(losses_a, losses_b, atol=1e-5)
    pa = jax.device_get(tr_a.state.params.online["patch_embed"]["kernel"])
    pb = jax.device_get(tr_b.state.params.online["patch_embed"]["kernel"])
    np.testing.assert_allclose(pa, pb, atol=1e-5)


def test_extract_features(tiny_ssp):
    """extract_online_features parity utility (dsn_ssn/ssp_single.py:140-156):
    default = eval-mode online PREDICTION-head output (B, proj_dim)."""
    ds = synthetic_dataset(image_size=28, split_sizes={"train": 20})
    tr = SSPTrainer(tiny_ssp, logger=QUIET)
    feats, labels = tr.extract_features(ds, batch_size=8)
    assert feats.shape == (20, tiny_ssp.proj_dim)
    assert labels.shape == (20,)
    feats2, _ = tr.extract_features(ds, batch_size=8)
    np.testing.assert_array_equal(feats, feats2)  # deterministic views
    assert np.isfinite(feats).all()
    # framework extension: raw concatenated backbone features
    raw, _ = tr.extract_features(ds, batch_size=8, features="backbone")
    assert raw.shape == (20, 2 * tiny_ssp.vit.hidden_size)  # dual stream


def test_plateau_threshold_matches_torch():
    """torch default threshold=1e-4 (rel): sub-threshold micro-improvements
    count as bad epochs; the lr-drop epoch must match torch exactly
    (octmnist_ft_vit2spn.py:193)."""
    torch = pytest.importorskip("torch")
    # plateau with micro-improvements below best*(1-1e-4), then a real drop
    seq = [1.0, 0.99999, 0.99997, 0.99996, 0.99995, 0.99994, 0.5,
           0.49999, 0.499991, 0.499985, 0.49998, 0.499979, 0.4]
    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=1.0)
    sch = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, "min", factor=0.1, patience=3
    )
    ours = ReduceLROnPlateau(factor=0.1, patience=3)
    for metric in seq:
        sch.step(metric)
        scale = ours.step(metric)
        assert opt.param_groups[0]["lr"] == pytest.approx(scale, abs=1e-12), (
            f"diverged at metric={metric}"
        )
    assert ours.scale < 1.0  # the plateau actually triggered a drop


def _no_rand_cfg(tiny_ssp):
    """Augmentation + dropout off so duplicated samples are bit-identical."""
    return dataclasses.replace(
        tiny_ssp,
        proj_dropout=0.0,
        data=dataclasses.replace(
            tiny_ssp.data,
            augment=dataclasses.replace(
                tiny_ssp.data.augment, enabled=False
            ),
        ),
    )


def test_masked_tail_group_matches_unpadded(tiny_ssp):
    """A weight-0-padded microbatch must produce EXACTLY the update of the
    reference's partial batch (ssp_vit2spn_tiny.py:215): masked mean over
    {s1..s4, pad} == full mean over {s1..s4, s1..s4} duplicates."""
    cfg = _no_rand_cfg(tiny_ssp)  # eff = 8 * 2 microbatches? no: 8x2=16
    ds = synthetic_dataset(image_size=28, split_sizes={"train": 32}, seed=11)
    eff = cfg.effective_batch
    assert eff == 16
    mb1 = ds.images[:8]
    real = ds.images[8:12]      # 4 real tail samples
    garbage = ds.images[20:24]  # pad content must not matter

    batch_a = np.concatenate([mb1, real, garbage])
    w_a = np.array([1.0] * 12 + [0.0] * 4, np.float32)
    batch_b = np.concatenate([mb1, real, real])

    key = jax.random.key(3)
    tr_a = SSPTrainer(cfg, logger=QUIET)
    la = float(tr_a.train_step(batch_a, key, w=w_a)["loss"])
    tr_b = SSPTrainer(cfg, logger=QUIET)
    lb = float(tr_b.train_step(batch_b, key)["loss"])
    np.testing.assert_allclose(la, lb, atol=1e-6)
    pa = jax.device_get(tr_a.state.params.online["patch_embed"]["kernel"])
    pb = jax.device_get(tr_b.state.params.online["patch_embed"]["kernel"])
    np.testing.assert_allclose(pa, pb, atol=1e-6)
    # pad content must not influence the update
    batch_c = np.concatenate([mb1, real, ds.images[24:28]])
    tr_c = SSPTrainer(cfg, logger=QUIET)
    lc = float(tr_c.train_step(batch_c, key, w=w_a)["loss"])
    np.testing.assert_allclose(la, lc, atol=1e-7)


def test_fit_trains_epoch_tail(tiny_ssp, tmp_path):
    """With train_tail (default) every sample of a non-divisible epoch
    trains: images_per_sec * seconds == n, and one extra step runs."""
    import json

    ds = synthetic_dataset(image_size=28, split_sizes={"train": 35}, seed=2)
    log_path = tmp_path / "tail.jsonl"
    with MetricLogger(str(log_path), echo=False) as logger:
        tr = SSPTrainer(tiny_ssp, logger=logger)
        tr.fit(ds, epochs=1)
    ev = [json.loads(l) for l in open(log_path)]
    ep = [e for e in ev if e["event"] == "ssp_epoch"][0]
    assert round(ep["images_per_sec"] * ep["seconds"]) == 35  # eff 16 -> 2x16+3

    cfg_off = dataclasses.replace(tiny_ssp, train_tail=False)
    log2 = tmp_path / "notail.jsonl"
    with MetricLogger(str(log2), echo=False) as logger:
        tr = SSPTrainer(cfg_off, logger=logger)
        tr.fit(ds, epochs=1)
    ev = [json.loads(l) for l in open(log2)]
    ep = [e for e in ev if e["event"] == "ssp_epoch"][0]
    assert round(ep["images_per_sec"] * ep["seconds"]) == 32  # tail dropped


def test_shard_map_accepts_masked_tail(tiny_ssp):
    """shard_map mode supports the weight-masked epoch tail (global-psum
    normalization); GSPMD-vs-shard_map equality on an actual masked tail is
    asserted in tests/test_shard_map.py."""
    tr = SSPTrainer(tiny_ssp, logger=QUIET, dist_mode="shard_map")
    ds = synthetic_dataset(image_size=28, split_sizes={"train": 32})
    assert tr.attach_dataset(ds.images)
    idx = np.arange(16)[None]
    keys = jax.random.split(jax.random.key(0), 1)
    m = tr.train_epoch(idx, keys, np.ones((1, 16), np.float32))
    assert np.isfinite(float(m["loss"][0]))


def test_restore_best_weights_semantics(tiny_ft):
    """The reference's best-weight restore is a NO-OP (best_weights =
    model.state_dict() at octmnist_ft_vit2spn.py:119 aliases the live
    in-place-updated params, so :126 restores the current weights). The
    faithful default therefore keeps the FINAL epoch's weights;
    restore_best_weights=True genuinely restores the best epoch's."""
    from vit2spn_tpu.core.config import AugmentConfig, DataConfig

    cfg = dataclasses.replace(
        tiny_ft, epochs=3, use_early_stop=False, use_scheduler=False,
        data=DataConfig(name="synthetic",
                        augment=AugmentConfig(out_size=32, enabled=False)),
    )
    ds = synthetic_dataset(image_size=28, split_sizes={"train": 32}, seed=5)
    w = balanced_class_weights(ds.labels, 4)

    def scripted(vals):
        it = iter(vals)

        def fake_evaluate(val_ds, cw, seed=0):
            return next(it), None, None

        return fake_evaluate

    def run(cfg, vals, epochs):
        tr = FineTuneTrainer(cfg, num_classes=4, logger=QUIET,
                             eval_augment=False)
        tr.evaluate = scripted(vals)  # val loss script: best at epoch 2
        tr.fit(ds, ds, w, epochs=epochs)
        return jax.device_get(tr.state)

    final = run(cfg, [1.0, 0.5, 0.9], 3)                      # default: final
    restored = run(
        dataclasses.replace(cfg, restore_best_weights=True),  # genuine restore
        [1.0, 0.5, 0.9], 3,
    )
    at_best = run(cfg, [1.0, 0.5], 2)                         # state at best

    fin, res, best = (jax.tree.leaves((s.backbone, s.head))
                      for s in (final, restored, at_best))
    # default == the reference's effective behavior: final-epoch weights
    assert any(not np.array_equal(a, b) for a, b in zip(fin, res))
    # opt-in restore == the state as of the best epoch
    for a, b in zip(res, best):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_trial_varies_training_randomness_only(tiny_ft):
    """Multitrial trials re-draw init/shuffle keys while data stays fixed
    (the reference pins subset+folds at seed 42 and varies unseeded torch
    init/order across its manual retraining runs)."""
    t0 = FineTuneTrainer(tiny_ft, num_classes=4, logger=QUIET,
                         eval_augment=False)
    t0b = FineTuneTrainer(tiny_ft, num_classes=4, logger=QUIET,
                          eval_augment=False)
    t1 = FineTuneTrainer(tiny_ft, num_classes=4, logger=QUIET,
                         eval_augment=False, trial=1)
    w0 = np.asarray(jax.device_get(t0.state.head["linear_0"]["w"]))
    w0b = np.asarray(jax.device_get(t0b.state.head["linear_0"]["w"]))
    w1 = np.asarray(jax.device_get(t1.state.head["linear_0"]["w"]))
    np.testing.assert_array_equal(w0, w0b)  # trial 0 deterministic/unchanged
    assert not np.array_equal(w0, w1)  # trial 1 re-draws the init
