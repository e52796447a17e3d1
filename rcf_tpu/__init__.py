"""RCF-TPU: a TPU-native rebuild of RCF unsupervised video object segmentation.

A ground-up JAX/Flax/Pallas framework with the capabilities of
TonyLianLong/RCF-UnsupVideoSeg (CVPR 2023): unsupervised video object
segmentation by relaxed common fate + visual grouping, re-designed for
TPU (SPMD over a device mesh, fused XLA compute, Pallas kernels for the
dense-CRF hot path).

Layout:
  config    -- YAML config system (base_config inheritance + dotted CLI overrides)
  data      -- split parsing, paired augmentation pipeline, host data loader
  nn        -- Flax modules: ResNet, FCN heads, DINO ViT
  models    -- RCF composite model and the AMD baseline
  losses    -- relaxed common fate + regularizer losses (pure jnp)
  ops       -- resize / CRF / image ops (XLA + Pallas)
  parallel  -- mesh and sharding helpers (data parallel over ICI)
  train     -- train state, optimizer, jitted train step, loop
  eval      -- on-device IoU, channel election, exporters, benchmark evaluators
  grouping  -- DINO soft-NCut, MAA channel election, semantic constraints
"""

__version__ = "0.1.0"
