"""Dataset analysis tools (C9, preprocessing/*_dataset.py).

Reproduces the per-dataset summary pipeline (preprocessing/octmnist_dataset.py:
27-201): image-size/aspect statistics, class distribution, per-channel
mean/std, sample grid + distribution figures, and the
`*_dataset_summary.json` artifact.
"""

from __future__ import annotations

import json
import os
import numpy as np

from vit2spn_tpu.data.datasets import Dataset


def image_properties(ds: Dataset) -> dict:
    """The reference's raw-file size statistics (get_image_properties,
    preprocessing/octmnist_dataset.py:27-78; published in
    octid_dataset_summary.json): min/max/avg width, height, aspect ratio +
    avg file size, computed over the ORIGINAL pre-resize files when the
    loader recorded them (folder datasets), else over the canonical array
    (array datasets like octmnist, where raw == canonical)."""
    if ds.raw_sizes is not None:
        widths = ds.raw_sizes[:, 0].astype(np.float64)
        heights = ds.raw_sizes[:, 1].astype(np.float64)
    else:
        n, h, w = ds.images.shape[0], ds.images.shape[1], ds.images.shape[2]
        widths = np.full(n, float(w))
        heights = np.full(n, float(h))
    aspect = widths / heights
    props = {
        "min_width": int(widths.min()),
        "max_width": int(widths.max()),
        "avg_width": float(widths.mean()),
        "min_height": int(heights.min()),
        "max_height": int(heights.max()),
        "avg_height": float(heights.mean()),
        "min_aspect_ratio": float(aspect.min()),
        "max_aspect_ratio": float(aspect.max()),
        "avg_aspect_ratio": float(aspect.mean()),
        "corrupted_files": False,  # loader raises on undecodable files
    }
    if ds.raw_file_kb is not None:
        props["avg_file_size_kb"] = float(ds.raw_file_kb.mean())
    return props


def dataset_summary(ds: Dataset) -> dict:
    imgs = ds.images
    x = imgs.astype(np.float64) / 255.0
    counts = np.bincount(ds.labels, minlength=ds.num_classes)
    per_channel_mean = x.mean(axis=(0, 1, 2))
    per_channel_std = x.std(axis=(0, 1, 2))
    h, w = imgs.shape[1], imgs.shape[2]
    return {
        "dataset": ds.name,
        "num_samples": int(len(ds)),
        "num_classes": int(ds.num_classes),
        "class_names": list(ds.class_names),
        "class_distribution": {
            ds.class_names[i]: int(c) for i, c in enumerate(counts)
        },
        "image_size": {"height": int(h), "width": int(w),
                       "aspect_ratio": float(w / h)},
        # raw pre-resize statistics (preprocessing/octmnist_dataset.py:27-78)
        "image_properties": image_properties(ds),
        "channels": int(imgs.shape[3]),
        "pixel_mean": [float(m) for m in per_channel_mean],
        "pixel_std": [float(s) for s in per_channel_std],
        "splits": {k: int(len(v)) for k, v in ds.splits.items()},
    }


def write_summary(ds: Dataset, out_dir: str,
                  make_figures: bool = True) -> str:
    """Emit `<name>_dataset_summary.json` (+ sample-grid and class-
    distribution figures, preprocessing/octmnist_dataset.py:117-185)."""
    os.makedirs(out_dir, exist_ok=True)
    summary = dataset_summary(ds)
    path = os.path.join(out_dir, f"{ds.name}_dataset_summary.json")
    with open(path, "w") as f:
        json.dump(summary, f, indent=2)

    if make_figures:
        try:
            _figures(ds, out_dir)
        except Exception as e:  # matplotlib optional
            print(f"figures skipped: {e}")
    return path


def _figures(ds: Dataset, out_dir: str, samples_per_class: int = 5):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    k = ds.num_classes
    fig, axes = plt.subplots(k, samples_per_class,
                             figsize=(2 * samples_per_class, 2 * k))
    # plt.subplots squeezes singleton dims (k=1 -> (cols,), cols=1 -> (k,));
    # atleast_2d would orient the cols=1 case as (1, k) — reshape instead
    axes = np.asarray(axes).reshape(k, samples_per_class)
    for ci in range(k):
        idx = np.flatnonzero(ds.labels == ci)[:samples_per_class]
        for j in range(samples_per_class):
            ax = axes[ci, j]
            ax.axis("off")
            if j < len(idx):
                ax.imshow(ds.images[idx[j], ..., 0], cmap="gray")
                if j == 0:
                    ax.set_title(ds.class_names[ci], fontsize=8)
    fig.tight_layout()
    fig.savefig(os.path.join(out_dir, f"{ds.name}_samples.png"), dpi=100)
    plt.close(fig)

    counts = np.bincount(ds.labels, minlength=k)
    fig, ax = plt.subplots(figsize=(6, 4))
    ax.bar(range(k), counts)
    ax.set_xticks(range(k))
    ax.set_xticklabels(ds.class_names, rotation=30, ha="right", fontsize=8)
    ax.set_ylabel("samples")
    ax.set_title(f"{ds.name} class distribution")
    fig.tight_layout()
    fig.savefig(os.path.join(out_dir, f"{ds.name}_distribution.png"), dpi=100)
    plt.close(fig)
