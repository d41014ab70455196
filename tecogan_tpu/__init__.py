"""TecoGAN-TPU: a TPU-native (JAX/XLA/Pallas) video super-resolution
framework with the capabilities of dwight-foster/Pytorch-TecoGAN.

Layers (see SURVEY.md §7):
  ops/       pure-fn op library (warp, space-to-depth, resize, metrics)
  models/    Generator / Discriminator / FNet / VGG19 (flax, NHWC, bf16)
  engine/    jitted train step (TecoGAN losses) + lax.scan recurrent inference
  parallel/  mesh + data-parallel sharding over ICI
  data/      scene-folder datasets, synthetic fixtures, prefetch, prep CLIs
  utils/     checkpointing, summaries, precision policy
  cli/       main.py-compatible train/inference drivers + live demo
"""

__version__ = "0.1.0"
