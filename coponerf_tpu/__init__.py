"""CoPoNeRF-TPU: a TPU-native (JAX/XLA/Pallas) framework for generalized
pose-free novel view synthesis from unposed stereo pairs.

Built from scratch with the capabilities of cvlab-kaist/CoPoNeRF (CVPR 2024):
one forward pass jointly estimates dense correspondence, relative camera pose,
and renders novel views with an epipolar-attention light-field decoder.

Layout:
  ops/       TPU compute primitives (bilinear resize as matmuls, gather-based
             grid sampling, separable 4D convolution, correlation volumes,
             Pallas kernels for the hot paths)
  geometry/  camera / Plucker / epipolar math (pure jnp, shape-static)
  models/    flax.linen model zoo (ResNet encoder, UFC aggregation, pose head,
             light-field decoder, the CoPoNeRF top module)
  data/      input pipelines (RealEstate10K, ACID, synthetic test scenes)
  training/  train loop, losses, optimizer/schedule, checkpointing, summaries
  parallel/  mesh / sharding helpers (data-parallel + ray-sharded rendering)
  eval/      metrics (PSNR/SSIM/pose errors) + the offline eval harness
"""

__version__ = "0.1.0"
