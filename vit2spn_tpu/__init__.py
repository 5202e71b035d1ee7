"""ViT-2SPN-TPU: a TPU-native reimplementation of the capabilities of
mrsaraei/ViT-2SPN (dual-stream self-supervised ViT pretraining for retinal
OCT classification) as one idiomatic JAX/XLA/Pallas framework.

The reference (/root/reference) is ~30 standalone PyTorch scripts; this
package replaces them with composable modules plus named presets that keep
one runnable entry point per reference script (see `vit2spn_tpu.core.presets`).

Layering (bottom-up):
  core      - configs, presets, dtype policy, RNG discipline
  parallel  - device mesh, shardings, collectives (replaces the reference's
              dead DDP/NCCL scaffold, ssp_vit2spn_tiny.py:20-25)
  ops       - Pallas TPU kernels (fused attention) + XLA fallbacks
  models    - functional ViT-Tiny, SSP networks, classifier heads
  data      - dataset registry, on-device augmentation pipeline
  train     - SSP and fine-tune trainers, optimizers, checkpointing
  evals     - k-fold CV protocol, metrics, plots
  utils     - metric logging, FLOPs introspection
"""

__version__ = "0.1.0"
