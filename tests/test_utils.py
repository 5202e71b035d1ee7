import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit2spn_tpu.core import rng as rngmod
from vit2spn_tpu.utils.flops import dual_stream_report, forward_flops
from vit2spn_tpu.utils.logging import MetricLogger
from vit2spn_tpu.utils.profiling import op_breakdown, profile_fn


def test_rng_fold_deterministic_and_distinct():
    k = rngmod.root_key(42)
    a = rngmod.fold(k, 1, 2)
    b = rngmod.fold(k, 1, 2)
    c = rngmod.fold(k, 2, 1)
    assert jax.random.key_data(a).tolist() == jax.random.key_data(b).tolist()
    assert jax.random.key_data(a).tolist() != jax.random.key_data(c).tolist()
    named = rngmod.split_tree(k, ["x", "y"])
    assert set(named) == {"x", "y"}


def test_forward_flops_matmul():
    f = lambda a, b: a @ b
    x = jnp.ones((64, 128))
    y = jnp.ones((128, 32))
    flops = forward_flops(f, x, y)
    # XLA counts 2*M*N*K for a matmul
    assert flops == pytest.approx(2 * 64 * 128 * 32, rel=0.01)


def test_dual_stream_report_param_parity(tiny_ssp):
    from vit2spn_tpu.models.ssp import init_dual_stream

    params = init_dual_stream(jax.random.key(0), tiny_ssp)
    rep = dual_stream_report(tiny_ssp, params)
    assert rep["trainable_params"] > 0
    assert rep["total_params"] > rep["trainable_params"]  # + frozen targets


def test_metric_logger_jsonl(tmp_path):
    import json

    path = str(tmp_path / "m.jsonl")
    with MetricLogger(path, echo=False) as log:
        log.log("evt", a=1, b=2.5)
        log.log("evt2", c="x")
    lines = [json.loads(l) for l in open(path)]
    assert lines[0]["event"] == "evt" and lines[0]["a"] == 1
    assert lines[1]["c"] == "x"


def test_profile_fn_cpu(tmp_path):
    f = jax.jit(lambda x: jnp.sin(x) @ x.T)
    rows = profile_fn(lambda: f(jnp.ones((128, 128))),
                      log_dir=str(tmp_path / "tr"), top=5)
    assert len(rows) > 0
    assert all(len(r) == 3 for r in rows)


def test_dual_stream_report_component_flops(tiny_ssp):
    """Component-wise FLOPs breakdown matches the reference's alternative
    calculation: n_streams*backbone + projection + prediction
    (ssp_vit2spn_tiny.py:188-194)."""
    from vit2spn_tpu.models.ssp import init_dual_stream

    params = init_dual_stream(jax.random.key(0), tiny_ssp)
    rep = dual_stream_report(tiny_ssp, params)
    for k in ("backbone_gflops", "projection_head_gflops",
              "prediction_head_gflops", "componentwise_gflops"):
        assert rep[k] is not None and rep[k] > 0
    n = 2 if tiny_ssp.dual_stream else 1
    assert rep["componentwise_gflops"] == pytest.approx(
        n * rep["backbone_gflops"] + rep["projection_head_gflops"]
        + rep["prediction_head_gflops"], abs=2e-4,
    )
    # the full dual-stream forward also runs the target backbones, so it
    # must exceed the online-only component sum
    assert rep["forward_gflops"] > rep["componentwise_gflops"]


def test_device_memory_report_shape(monkeypatch):
    """TPU-native log_gpu_memory equivalent (ssp_vit2spn_tiny.py:178-181):
    returns {} on stat-less backends, else per-device MB fields. CPU exposes
    no stats, so exercise the stats branch with a fake device too."""
    import jax

    from vit2spn_tpu.utils.profiling import device_memory_report

    rep = device_memory_report()
    assert isinstance(rep, dict)  # CPU: {} (no stats)

    class FakeDev:
        id = 7

        def memory_stats(self):
            return {"bytes_in_use": 3 << 20, "peak_bytes_in_use": 5 << 20,
                    "bytes_limit": 16 << 30}

    class RaisingDev:
        id = 8

        def memory_stats(self):
            raise RuntimeError("no stats")

    monkeypatch.setattr(jax, "local_devices",
                        lambda *a, **k: [FakeDev(), RaisingDev()])
    rep = device_memory_report()
    assert set(rep) == {"7"}  # the raising device is skipped, not fatal
    stats = rep["7"]
    assert set(stats) == {"bytes_in_use_mb", "peak_bytes_mb",
                          "bytes_limit_mb"}
    assert stats["bytes_in_use_mb"] == 3.0
    assert stats["peak_bytes_mb"] == 5.0
    assert stats["bytes_limit_mb"] == 16 * 1024.0


def test_metric_logger_tensorboard(tmp_path):
    """Optional TB mirroring (SURVEY.md section 5 'JSONL + optional TB'):
    numeric fields become scalars tagged <event>/<field>, stepped per event
    type; non-numeric fields are skipped; JSONL is unaffected."""
    pytest.importorskip("torch.utils.tensorboard")
    from vit2spn_tpu.utils.logging import MetricLogger

    tb_dir = str(tmp_path / "tb")
    with MetricLogger(str(tmp_path / "m.jsonl"), echo=False,
                      tb_dir=tb_dir) as lg:
        lg.log("ssp_epoch", epoch=1, loss=-0.5, note="text-skipped")
        lg.log("ssp_epoch", epoch=2, loss=-0.7)
        lg.log("checkpoint", path="/x")  # no numeric fields

    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )

    acc = EventAccumulator(tb_dir)
    acc.Reload()
    tags = set(acc.Tags()["scalars"])
    assert {"ssp_epoch/epoch", "ssp_epoch/loss"} <= tags
    assert "ssp_epoch/note" not in tags
    losses = [(e.step, e.value) for e in acc.Scalars("ssp_epoch/loss")]
    assert losses == [(0, pytest.approx(-0.5)), (1, pytest.approx(-0.7))]
    # JSONL still intact
    lines = (tmp_path / "m.jsonl").read_text().strip().splitlines()
    assert len(lines) == 3
