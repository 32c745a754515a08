"""custom_diffusion360_tpu — TPU-native framework for pose-controlled SDXL customization.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
customdiffusion360/custom-diffusion360 ("Customizing Text-to-Image Diffusion with
Object Viewpoint Control", SIGGRAPH Asia 2024): FeatureNeRF-augmented SDXL
fine-tuning and pose-conditioned sampling, built for TPU device meshes.

Layering (mirrors the reference's layer map, SURVEY.md §1, but idiomatic JAX):

  geometry/   pure-JAX camera + ray math (replaces pytorch3d camera stack)
  ops/        TPU kernels: flash attention, bilinear sampling, sample_pdf,
              volume rendering (replaces xformers / cuDNN grid_sample /
              pytorch3d _C.sample_pdf)
  models/     functional networks over param pytrees: SDXL UNet (dual-stream),
              FeatureNeRF, VAE, CLIP text towers, conditioner
  diffusion/  EDM denoiser, discretizations, sigma samplers, guiders,
              samplers as lax.scan loops, training losses
  parallel/   jax.sharding Mesh construction + partition specs (replaces DDP/NCCL)
  train/      train step, optimizer masking, checkpoints (delta format), capture
  data/       CO3D/NAVI data pipeline (host-side numpy + on-device preprocessing)
  eval/       FID (InceptionV3 pool3) + CLIP-T/CLIP-I metrics
  cli/        train / sample / evaluate entry points
"""

__version__ = "0.1.0"
