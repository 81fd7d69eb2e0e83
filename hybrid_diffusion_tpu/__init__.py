"""hybrid_diffusion_tpu — TPU-native hybrid two-domain diffusion image enhancement.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
gusanagy/Hybrid-Diffusion-Underwater-Atmopheric-Image-Enhancement:

- conditional DDPM/DDIM enhancement of underwater + atmospheric (low-light)
  images (reference: diffusion/Diffusion.py, diffusion/Model.py)
- classifier-free-guidance label-conditional DDPM (reference:
  DiffusionFreeGuidence/)
- composite enhancement losses: DINO perceptual, MS-SSIM, angular color,
  Charbonnier (reference: Loss/loss.py)
- underwater image quality metrics: PSNR/SSIM/UIQM/UCIQE/UISM/UICM/UICONM/FID
  (reference: metrics/metrics.py)
- staged two-domain training, checkpointing, eval/inference orchestration
  (reference: utils/rotinas.py, Main.py)

Design: functional core (pure train/sample steps), flax.linen modules in NHWC,
`lax.scan` over diffusion time, GSPMD data/tensor parallelism over a
`jax.sharding.Mesh`, Pallas kernels for the attention bottleneck.
"""

__version__ = "0.1.0"
