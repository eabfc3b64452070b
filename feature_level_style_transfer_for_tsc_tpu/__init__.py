"""feature_level_style_transfer_for_tsc_tpu — a TPU-native JAX framework for
feature-level style transfer & multi-source transfer learning for time-series
classification.

Re-designed TPU-first (JAX / XLA / Pallas / pjit) with the capabilities of the
reference implementation `BaeHann/feature_level_style_transfer_for_TSC`:

- OS-CNN omni-scale residual feature extractors and classifiers
  (reference: OS_CNN/OS_CNN.py, OS_CNN/OS_CNN_Structure_build.py)
- Simplified WaveGlow normalizing flow for feature-level style transfer
  (reference: Simplified_NF_WaveGlow.py)
- CDAN + gradient-reversal + WGAN-critic adversarial domain alignment
  (reference: C_DAN.py, widgets.py)
- GradNorm loss balancing + CPC self-supervision
  (reference: train_and_test.py, Comparison/SLARDA/train.py)
- Multi-source ensembling with entropy/precision-weighted voting
  (reference: multi_source_voting.py)
- CoDATS / SLARDA comparison baselines (reference: Comparison/)

Unlike the reference (single-GPU PyTorch), everything here is functional,
jit-compiled, shape-static, and shards over a `jax.sharding.Mesh` with axes
("data", "domain") so data parallelism and source-domain parallelism ride the
TPU ICI via XLA collectives.
"""

__version__ = "0.1.0"
