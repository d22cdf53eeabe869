"""FusionDepth-TPU: a TPU-native (JAX/Flax/Pallas/pjit) self-supervised
monocular depth + sparse-LiDAR fusion framework.

Re-designed from scratch with the capabilities of AutoAILab/FusionDepth
(CoRL 2021, arXiv 2109.09628): two-stage self-supervised depth from an RGB
image fused with sparse (e.g. 4-beam) LiDAR, plus KITTI depth completion and
detection-export workloads.

Layout (TPU-first, not a port):
  ops/       pure-jnp differentiable ops (reprojection, grid-sample, SSIM, ...)
  models/    Flax modules (ResNet encoders, U-Net depth decoder, pose nets)
  data/      host-side input pipeline (KITTI IO, sparsify, 2-channel encoding)
  gdc/       graph-based depth correction as batched JAX linear algebra
  parallel/  mesh / sharding / data-parallel train-step utilities
  training/  trainer / refiner / completor / eval drivers
"""

__version__ = "0.1.0"
