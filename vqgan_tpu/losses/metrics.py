"""Standard reconstruction quality metrics for eval: PSNR and SSIM.

The reference logs only wandb image grids at eval (vae_trainer.py:892-901);
BASELINE.md's quality contract uses LPIPS + a VGG-Fréchet proxy. PSNR/SSIM
complete the standard triple — both are pure jnp (jit-able, TPU-friendly)
over NHWC images in [0, 1].

SSIM follows Wang et al. 2004: 11×11 Gaussian window (σ=1.5), K1=0.01,
K2=0.03, computed per channel and averaged — the skimage/torchmetrics
default configuration.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def psnr(a: jax.Array, b: jax.Array, max_val: float = 1.0) -> jax.Array:
    """Peak signal-to-noise ratio in dB over the full batch."""
    mse = jnp.mean((a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2)
    return 10.0 * jnp.log10(max_val**2 / jnp.maximum(mse, 1e-12))


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-(x**2) / (2 * sigma**2))
    g /= g.sum()
    return np.outer(g, g)


def ssim(
    a: jax.Array, b: jax.Array, max_val: float = 1.0,
    window_size: int = 11, sigma: float = 1.5,
) -> jax.Array:
    """Mean structural similarity over a batch of NHWC images in [0, max_val].

    Depthwise-convolves the Gaussian window per channel (VALID padding, like
    skimage's default) and averages the SSIM map over batch/space/channels.
    """
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    c = a.shape[-1]
    win = jnp.asarray(
        _gaussian_window(window_size, sigma), jnp.float32
    )[:, :, None, None]
    kernel = jnp.tile(win, (1, 1, 1, c))  # HWIO with feature_group_count=c

    def blur(x):
        # Precision.HIGHEST is load-bearing: the TPU's DEFAULT conv
        # precision is bf16, and ``blur(a*a) - mu_a**2`` then cancels
        # catastrophically — negative "variances" larger than c2 push the
        # SSIM map far outside [-1, 1] (observed eval/ssim 4.5 / -2.4 on a
        # flagship 256px hardware run; CPU tests never see it because the
        # CPU backend convolves in exact fp32 regardless).
        return jax.lax.conv_general_dilated(
            x, kernel, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
            precision=jax.lax.Precision.HIGHEST,
        )

    mu_a, mu_b = blur(a), blur(b)
    mu_aa, mu_bb, mu_ab = mu_a * mu_a, mu_b * mu_b, mu_a * mu_b
    # exact-math residual cancellation can still dip microscopically below
    # zero; clamp so the stabilized denominator can never change sign
    var_a = jnp.maximum(blur(a * a) - mu_aa, 0.0)
    var_b = jnp.maximum(blur(b * b) - mu_bb, 0.0)
    cov = blur(a * b) - mu_ab
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    ssim_map = ((2 * mu_ab + c1) * (2 * cov + c2)) / (
        (mu_aa + mu_bb + c1) * (var_a + var_b + c2)
    )
    return jnp.mean(ssim_map)
