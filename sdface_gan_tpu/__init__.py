"""sdface_gan_tpu — a TPU-native (JAX/XLA/Pallas/pjit) 3D-aware face GAN framework.

A ground-up rebuild of the capabilities of SDFace-GAN (StyleSDF lineage +
Instant-NGP hash grid + StyleGAN2 decoder + GIRAFFE compositional NeRF +
2D GAN baseline), designed TPU-first:

* all hot compute paths (hash-grid encoding, FiLM-SIREN MLPs, SDF volume
  rendering, StyleGAN2 conv pyramids) are expressed as large batched
  matmul/conv programs that XLA tiles onto the MXU,
* gradients that the reference computes with CUDA ``atomicAdd`` scatter
  (hash-grid backward) are deterministic XLA scatter-adds / segment sums,
* double-backprop losses (R1, eikonal, path-length) compose with
  ``jax.grad`` instead of autograd graph surgery,
* data parallel scale-out is a ``jax.sharding.Mesh`` + ``shard_map``
  with ``psum`` gradient reduction (the reference's DDP path was a stub).

Package layout:
  config/      typed config tree, YAML ``inherit_from`` loader, CLI options
  ops/         named TPU ops: fused_leaky_relu, upfirdn2d, SH + hash
               encoders, fast_sin, the fused Pallas SIREN kernel
  geometry/    camera sampling, ray generation, frustum alignment, meshes
  models/      SDF generator family (FiLM-SIREN/NGP/FC renderers),
               StyleGAN2 decoder, discriminators, noise projection
  losses/      GAN + geometry losses (R1, eikonal, path-reg, TV smoothness)
  training/    staged train steps/loops (sphere-init -> vol-render ->
               full pipeline -> encoder), optimizers, EMA, microbatching
  parallel/    device mesh + data-parallel jit (GSPMD)
  giraffe/     GIRAFFE compositional-NeRF family + render programs
  gan2d/       plain 2D GAN baseline
  encoder/     inversion encoders (VAE, pSp/ir_se-50, ArcFace ID, LPIPS)
  data/        record-store multi-resolution dataset + preparation
  evaluation/  InceptionV3 FID/KID in JAX
  native/      C++ host runtime (record store, marching cubes, rasterizer)
  utils/       checkpoints, metrics/profiler logging, weight import
  serving.py   compiled warmed sampler for deployment
"""

__version__ = "0.4.0"
