"""bench.py's driver contract: stdout is ONE JSON line, even under a backend
outage (BENCH_r03.json recorded an rc=1 raw traceback when the axon tunnel
was down — the driver's `"parsed": null` artifact this module prevents).

The probe runs device init in a SUBPROCESS because the real outage HUNG
`jax.devices()` rather than raising; an in-process try/except cannot bound
that. These tests force the failure with an unknown JAX_PLATFORMS value,
which makes the probe's child process fail fast.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_BROKEN = {
    **os.environ,
    "JAX_PLATFORMS": "no_such_backend",
    "JAX_PLATFORM_NAME": "no_such_backend",
    "VIT2SPN_PROBE_RETRIES": "2",
    "VIT2SPN_PROBE_WAIT_S": "0",
    "VIT2SPN_PROBE_TIMEOUT_S": "120",
}


def test_probe_backend_reports_broken_backend(monkeypatch):
    sys.path.insert(0, REPO)
    try:
        import bench
    finally:
        sys.path.remove(REPO)
    for k, v in _BROKEN.items():
        monkeypatch.setenv(k, v)
    err = bench._probe_backend(retries=1, wait_s=0.0, timeout_s=120.0)
    assert err is not None and err != ""


def test_bench_outage_degrades_to_one_json_error_line():
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, env=_BROKEN, timeout=300, cwd=REPO,
    )
    assert r.returncode == 1
    lines = [l for l in r.stdout.splitlines() if l.strip()]
    assert len(lines) == 1, f"stdout must be ONE line, got: {r.stdout!r}"
    rec = json.loads(lines[0])
    assert rec["metric"] == "ssp_images_per_sec_per_chip"
    assert rec["value"] is None
    assert rec["vs_baseline"] is None
    assert rec["error"]


def test_error_line_metric_mirrors_requested_variant():
    """A failed non-default run must report the error under the metric name
    it was asked to measure, not the default's (argv-scan mirror of main()'s
    suffix logic — no backend needed)."""
    sys.path.insert(0, REPO)
    try:
        import bench
    finally:
        sys.path.remove(REPO)
    m = bench._requested_metric
    assert m([]) == "ssp_images_per_sec_per_chip"
    assert m(["--mode", "hires"]) == "ssp_images_per_sec_per_chip_hires"
    assert m(["--mode=hires", "--cold"]) == (
        "ssp_cold_epoch_images_per_sec_per_chip_hires"
    )
    assert m(["--mode", "inference"]) == "ssp_inference_images_per_sec_per_chip"
    assert m(["--attn", "xla"]) == "ssp_images_per_sec_per_chip_attnxla"
    assert m(["--vit=base"]) == "ssp_images_per_sec_per_chip_vitbase"
    assert m(["--mode", "hires", "--attn=xla"]) == (
        "ssp_images_per_sec_per_chip_hires_attnxla"
    )
    # repeated flags: last occurrence wins, like argparse
    assert m(["--mode", "hires", "--mode", "octmnist"]) == (
        "ssp_images_per_sec_per_chip"
    )
    assert m(["--mode=octmnist", "--mode", "hires"]) == (
        "ssp_images_per_sec_per_chip_hires"
    )


def test_abbreviated_flags_rejected(capsys):
    """main()'s parser must reject abbreviations (allow_abbrev=False) so the
    exact-string argv scan in _requested_metric stays a faithful mirror —
    `--mod hires` parsing as --mode would mislabel a failed run."""
    import pytest

    sys.path.insert(0, REPO)
    try:
        import bench
    finally:
        sys.path.remove(REPO)
    with pytest.raises(SystemExit) as e:
        bench.main(["--mod", "hires"])
    assert e.value.code == 2  # argparse usage error, no backend work done
    assert "--mod" in capsys.readouterr().err
