import json
import os

import numpy as np
import pytest

from vit2spn_tpu.data.datasets import (
    Dataset,
    load_dataset,
    load_octmnist,
    synthetic_dataset,
)
from vit2spn_tpu.data.stats import dataset_summary, write_summary


def test_registry_known_names():
    for name in ("octmnist", "octid", "ucsdoct", "synthetic"):
        ds = load_dataset(name)
        assert isinstance(ds, Dataset)
        assert len(ds) > 0
    with pytest.raises(KeyError):
        load_dataset("nope")


def test_octmnist_npz_roundtrip(tmp_path):
    """medmnist-format npz is parsed with correct splits and shapes."""
    rng = np.random.default_rng(0)
    payload = {}
    sizes = {"train": 20, "val": 8, "test": 6}
    for split, n in sizes.items():
        payload[f"{split}_images"] = rng.integers(0, 255, (n, 28, 28), dtype=np.uint8)
        payload[f"{split}_labels"] = rng.integers(0, 4, (n, 1))
    np.savez(tmp_path / "octmnist.npz", **payload)

    ds = load_octmnist(root=str(tmp_path))
    assert len(ds) == 34
    assert ds.images.shape == (34, 28, 28, 1)
    for split, n in sizes.items():
        sub = ds.split(split)
        assert len(sub) == n
        np.testing.assert_array_equal(
            sub.images[..., 0], payload[f"{split}_images"]
        )
        np.testing.assert_array_equal(
            sub.labels, payload[f"{split}_labels"].reshape(-1)
        )


def test_octmnist_synthetic_fallback_sizes(monkeypatch):
    # capture the requested split sizes instead of materializing the full
    # ~108k-image synthetic build (tens of seconds on this 1-vCPU host)
    import vit2spn_tpu.data.datasets as dsmod

    captured = {}
    real = dsmod.synthetic_dataset

    def capturing(*args, **kw):
        captured.update(kw.get("split_sizes") or {})
        kw["split_sizes"] = {k: max(v // 1000, 4)
                             for k, v in kw["split_sizes"].items()}
        return real(*args, **kw)

    monkeypatch.setattr(dsmod, "synthetic_dataset", capturing)
    ds = load_octmnist(root="/nonexistent")
    # reference split sizes (97,477 train — README.md:20)
    assert captured["train"] == 97477
    assert set(ds.splits) >= {"train", "test"}
    with pytest.raises(FileNotFoundError):
        load_octmnist(root="/nonexistent", allow_synthetic=False)


def test_folder_dataset(tmp_path):
    PIL = pytest.importorskip("PIL.Image")
    root = tmp_path / "octird"
    rng = np.random.default_rng(0)
    for cls in ("amd", "csr", "normal"):
        d = root / cls
        d.mkdir(parents=True)
        for i in range(3):
            arr = rng.integers(0, 255, (40, 60), dtype=np.uint8)
            PIL.fromarray(arr).save(d / f"img{i}.png")
    ds = load_dataset("octid", root=str(tmp_path), source_size=32)
    assert len(ds) == 9
    assert ds.images.shape == (9, 32, 32, 1)
    assert ds.class_names == ["amd", "csr", "normal"]  # sorted ImageFolder order
    assert set(ds.labels) == {0, 1, 2}
    assert ds.synthetic is False  # real on-disk data -> real lineage


def test_subset_preserves_metadata():
    ds = synthetic_dataset(split_sizes={"train": 30})
    sub = ds.subset(np.arange(5), "five")
    assert len(sub) == 5
    assert sub.num_classes == ds.num_classes
    assert sub.class_names == ds.class_names


def test_synthetic_flag_lineage():
    """The synthetic-stand-in flag is the ONLY way to tell a loader's
    silent fallback apart from real data (the fallback reuses the real
    dataset's name) — it must survive subset()/split(), and real-format
    loads must carry False (checkpoint lineage gate, evals/parity.py)."""
    ds = synthetic_dataset(split_sizes={"train": 30, "val": 10})
    assert ds.synthetic is True
    assert ds.split("train").synthetic is True
    assert ds.subset(np.arange(3)).synthetic is True


def test_loader_fallback_carries_synthetic_flag(tmp_path, monkeypatch):
    """The ACTUAL loader fallback (not just the generator) must produce the
    name-collision case the lineage gate exists for: the real dataset's
    name with synthetic=True. If a loader ever reconstructed the Dataset on
    fallback and dropped the flag to its False default, a stand-in-trained
    checkpoint would pass the parity runbook's gate as real data."""
    import vit2spn_tpu.data.datasets as dsmod

    real = dsmod.synthetic_dataset

    def shrunk(*args, **kw):  # don't materialize the ~108k-image stand-in
        kw["split_sizes"] = {k: max(v // 1000, 4)
                             for k, v in (kw.get("split_sizes") or {}).items()}
        return real(*args, **kw)

    monkeypatch.setattr(dsmod, "synthetic_dataset", shrunk)
    for name in ("octmnist", "octid", "ucsdoct"):
        ds = load_dataset(name, root=str(tmp_path))  # empty root -> fallback
        assert ds.name == name
        assert ds.synthetic is True
        # and the split fit() actually consumes keeps both
        split = next(iter(ds.splits))
        tr = ds.split(split)
        assert tr.name == f"{name}/{split}" and tr.synthetic is True


def test_dataset_summary_contents():
    ds = synthetic_dataset(num_classes=3, split_sizes={"train": 30, "val": 10})
    s = dataset_summary(ds)
    assert s["num_samples"] == 40
    assert s["num_classes"] == 3
    assert sum(s["class_distribution"].values()) == 40
    assert s["splits"] == {"train": 30, "val": 10}
    assert 0.0 <= s["pixel_mean"][0] <= 1.0


def test_write_summary_json(tmp_path):
    ds = synthetic_dataset(split_sizes={"train": 16})
    path = write_summary(ds, str(tmp_path), make_figures=False)
    assert json.loads(open(path).read())["dataset"] == "synthetic"


def test_octmnist_npz_format_validation(tmp_path):
    """Handcrafted medmnist-format octmnist.npz must load with correct
    splits/shapes/labels — the moment the real file appears, `run ssp` and
    `run ft-octmnist` execute the published protocol unmodified."""
    rng = np.random.default_rng(0)
    sizes = {"train": 12, "val": 5, "test": 7}
    arrays = {}
    for split, n in sizes.items():
        arrays[f"{split}_images"] = rng.integers(
            0, 255, (n, 28, 28), dtype=np.uint8
        )
        arrays[f"{split}_labels"] = rng.integers(0, 4, (n, 1)).astype(np.int64)
    np.savez(tmp_path / "octmnist.npz", **arrays)

    ds = load_dataset("octmnist", root=str(tmp_path))
    assert len(ds) == sum(sizes.values())
    assert ds.images.shape == (24, 28, 28, 1) and ds.images.dtype == np.uint8
    assert ds.num_classes == 4 and len(ds.class_names) == 4
    for split, n in sizes.items():
        sub = ds.split(split)
        assert len(sub) == n
        np.testing.assert_array_equal(
            sub.images[..., 0], arrays[f"{split}_images"]
        )
        np.testing.assert_array_equal(
            sub.labels, arrays[f"{split}_labels"].reshape(-1)
        )


def test_folder_raw_image_properties(tmp_path):
    """Raw pre-resize size statistics survive the canonical resize — the
    reference computes min/max/avg width/height/aspect over the ORIGINAL
    files (preprocessing/octmnist_dataset.py:27-78, published in
    octid_dataset_summary.json)."""
    PIL = pytest.importorskip("PIL.Image")
    from vit2spn_tpu.data.stats import image_properties

    root = tmp_path / "octird"
    rng = np.random.default_rng(1)
    sizes = [(60, 40), (90, 60), (750, 500)]  # (w, h), aspect 1.5 each
    for ci, cls in enumerate(("amd", "csr")):
        d = root / cls
        d.mkdir(parents=True)
        for i, (w, h) in enumerate(sizes):
            arr = rng.integers(0, 255, (h, w), dtype=np.uint8)
            PIL.fromarray(arr).save(d / f"img{i}.png")

    ds = load_dataset("octid", root=str(tmp_path), source_size=32)
    assert ds.images.shape == (6, 32, 32, 1)  # canonical array is resized
    assert ds.raw_sizes.shape == (6, 2)

    props = image_properties(ds)
    assert props["min_width"] == 60 and props["max_width"] == 750
    assert props["min_height"] == 40 and props["max_height"] == 500
    assert props["avg_width"] == pytest.approx(np.mean([60, 90, 750]))
    assert props["avg_aspect_ratio"] == pytest.approx(1.5)
    assert props["avg_file_size_kb"] > 0
    # summary JSON carries the block, and subsets slice the raw sizes
    s = dataset_summary(ds)
    assert s["image_properties"]["max_width"] == 750
    sub = ds.subset(np.array([0, 1]))
    assert sub.raw_sizes.shape == (2, 2)


def test_array_dataset_image_properties_degenerate_ok():
    """Array datasets (octmnist/synthetic) have raw == canonical sizes."""
    from vit2spn_tpu.data.stats import image_properties

    ds = synthetic_dataset(image_size=28, split_sizes={"train": 8})
    props = image_properties(ds)
    assert props["min_width"] == props["max_width"] == 28
    assert props["avg_aspect_ratio"] == 1.0
    assert "avg_file_size_kb" not in props


def test_synthetic_nonsquare_shape():
    """image_size may be (H, W) — non-square stand-ins for raw scan shapes
    (UCSD JPEGs are e.g. 496x512)."""
    ds = synthetic_dataset(image_size=(48, 64), split_sizes={"all": 6})
    assert ds.images.shape == (6, 48, 64, 1)
    # class signal still present: different labels, different frequencies
    assert len(set(ds.labels)) > 1


def test_folder_dataset_nonsquare_decode(tmp_path):
    """source_size=(H, W) keeps a non-square host decode shape; the device
    augment path squashes to square (torchvision Resize((s,s)) semantics)."""
    PIL = pytest.importorskip("PIL.Image")
    root = tmp_path / "octird"
    rng = np.random.default_rng(0)
    for cls in ("amd", "csr"):
        d = root / cls
        d.mkdir(parents=True)
        for i in range(2):
            arr = rng.integers(0, 255, (40, 60), dtype=np.uint8)
            PIL.fromarray(arr).save(d / f"img{i}.png")
    ds = load_dataset("octid", root=str(tmp_path), source_size=(24, 32))
    assert ds.images.shape == (4, 24, 32, 1)
