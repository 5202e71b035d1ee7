"""Stage a synthetic-but-REAL-FORMAT parity data root (dress rehearsal).

The parity runbook (`vit2spn parity`, evals/parity.py) is smoke-tested on
synthetic stand-ins; this tool stages a data root in the REAL on-disk
formats so the non-smoke runbook — real loaders, strict export ingest,
provenance gating, kill+resume — can be rehearsed end-to-end before the
actual datasets exist:

  octmnist.npz          medmnist layout: {split}_{images,labels}, 28x28 u8
                        (preprocessing/octmnist_dataset.py:12-17)
  octird/<cls>/*.jpg    5-class ImageFolder (octird_ft_vit2spn.py:46)
  ucsdoct/<cls>/*.jpg   4-class ImageFolder (ucsdoct_ft_vit2spn.py:47)
  vit_tiny.safetensors  HF-named ViTModel state dict at the FULL ViT-Tiny
                        geometry (ssp_vit2spn_tiny.py:112) — .npz fallback
                        when the safetensors package is unavailable

Images come from the class-structured synthetic generator (labels encoded
in spatial frequency) so the fine-tunes genuinely learn; the numbers are
still NOT parity evidence (the runbook's own provenance block records the
root used; the staged weights are random-init, not ImageNet).

Usage: python tools/stage_parity_data.py --root /tmp/parity_data
Then:  VIT2SPN_VIT_TINY_PATH=<root>/vit_tiny.safetensors \
           python -m vit2spn_tpu parity --data-root <root> --out <out> \
           --epochs 12 --ft-epochs 1
(--epochs 12 crosses the every-10-epochs SSP checkpoint so a mid-run kill
resumes from epoch 10.)
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np  # noqa: E402

from vit2spn_tpu.data.datasets import synthetic_dataset  # noqa: E402

OCTID_CLASSES = ["amd", "csr", "dr", "mh", "normal"]
UCSD_CLASSES = ["CNV", "DME", "DRUSEN", "NORMAL"]


def stage_octmnist(root, sizes):
    ds = synthetic_dataset(
        name="octmnist", num_classes=4, image_size=28, channels=1,
        split_sizes=sizes, seed=11,
    )
    arrs = {}
    for split in sizes:
        idx = ds.splits[split]
        arrs[f"{split}_images"] = ds.images[idx, :, :, 0]
        arrs[f"{split}_labels"] = ds.labels[idx].reshape(-1, 1)
    path = os.path.join(root, "octmnist.npz")
    np.savez(path, **arrs)
    return path


def stage_folder(root, sub, classes, n_per, size=256, seed=13):
    """Exactly n_per images per class, ALL carrying the generator's class
    signal — the label draw is uniform, so keep drawing fresh batches until
    every class is filled (a noise-image top-up would inject label noise
    and depress the rehearsal fine-tunes for reasons unrelated to the
    plumbing under test)."""
    from PIL import Image

    counts = {c: 0 for c in classes}
    draw_seed = seed
    while min(counts.values()) < n_per:
        ds = synthetic_dataset(
            num_classes=len(classes), image_size=size, channels=1,
            split_sizes={"all": 2 * n_per * len(classes)}, seed=draw_seed,
        )
        for img, lab in zip(ds.images, ds.labels):
            cls = classes[int(lab)]
            if counts[cls] >= n_per:
                continue
            d = os.path.join(root, sub, cls)
            os.makedirs(d, exist_ok=True)
            Image.fromarray(img[:, :, 0], "L").save(
                os.path.join(d, f"{counts[cls]:04d}.jpg"), quality=92
            )
            counts[cls] += 1
        draw_seed += 1000003  # fresh labels AND content next round
    return os.path.join(root, sub)


def stage_weights(root):
    import jax

    from vit2spn_tpu.core.config import ViTConfig
    from vit2spn_tpu.models.hf_convert import convert_to_hf_state_dict
    from vit2spn_tpu.models.vit import init_vit

    cfg = ViTConfig()
    state = convert_to_hf_state_dict(
        init_vit(jax.random.key(17), cfg), cfg
    )
    try:
        from safetensors.numpy import save_file

        path = os.path.join(root, "vit_tiny.safetensors")
        save_file(state, path)
    except ImportError:
        path = os.path.join(root, "vit_tiny.npz")
        np.savez(path, **state)
    return path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--ssp-train", type=int, default=4096,
                    help="SSP corpus size (4096 -> 4 steps/epoch at the "
                    "published effective batch 1024)")
    args = ap.parse_args()
    os.makedirs(args.root, exist_ok=True)
    p1 = stage_octmnist(
        args.root, {"train": args.ssp_train, "val": 256, "test": 512}
    )
    p2 = stage_folder(args.root, "octird", OCTID_CLASSES, n_per=24)
    p3 = stage_folder(args.root, "ucsdoct", UCSD_CLASSES, n_per=24)
    p4 = stage_weights(args.root)
    for p in (p1, p2, p3, p4):
        print(p)
    print(f"export VIT2SPN_VIT_TINY_PATH={p4}")


if __name__ == "__main__":
    main()
