"""vqgan_tpu — a TPU-native (JAX/XLA/Pallas) VAE-GAN training framework.

A from-scratch rebuild of the capabilities of cloneofsimo/vqgan-training
(reference mounted at /root/reference) designed TPU-first:

- NHWC convolutional models compiled by XLA onto the MXU,
- a single jitted GAN train step (generator forward shared between the
  discriminator and generator updates via ``jax.vjp``),
- data parallelism (+ optional fsdp/tensor axes) over a ``jax.sharding.Mesh``,
- gradient-normalization loss balancing as a ``jax.custom_vjp`` whose norm is
  global by construction under pjit global-batch semantics,
- Pallas kernels for the fusible hot ops (fp32 GroupNorm+swish over bf16).

Layout (mirrors SURVEY.md §1's layer map):
  parallel/  L1 distributed runtime: mesh construction, sharding rules
  data/      L2 host-side input pipeline: tar-shard streaming, transforms
  models/    L3 model families: 2D image VAE, 3D video VAE, VQ latent layer
  losses/    L4 objectives: LPIPS, patch discriminator, GAN/LeCam, recon
  train/     L5 orchestration: train state, jitted step, eval, checkpointing
  cli.py     L6 CLI flag surface matching the reference trainer
  ops/       kernels: groupnorm, wavelet, heatmap, gradnorm, resize
"""

__version__ = "0.1.0"
