"""avt_tpu: a TPU-native framework for anticipative video transformers.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
facebookresearch/AVT (Anticipative Video Transformer, ICCV'21): action
anticipation in video with a frame-level ViT backbone (AVT-b) feeding a
causal transformer future-prediction head (AVT-h), trained with
classification + feature-regression (+ optionally InfoNCE) losses.

Layout (mirrors the reference's layer map, SURVEY.md §1, rebuilt TPU-first):
  config/    -- config groups + override-file composition (replaces Hydra)
  data/      -- annotations, anticipation window math, readers, input pipeline
  models/    -- flax model zoo: composition root, backbones, AVT-h head
  ops/       -- Pallas TPU kernels (fused attention, ...)
  losses/    -- multidim CE, normed MSE, InfoNCE (mesh-aware)
  train/     -- jitted train step, optax param groups/schedules, checkpointing
  evaluate/  -- result sinks, recall@5 / marginalization / late-fusion metrics
  parallel/  -- device mesh + sharding helpers
"""

__version__ = "0.1.0"
