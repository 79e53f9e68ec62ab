"""Blurriness heatmap — the low-pass MSE mask (reference vae_trainer.py:143-176).

Grayscale → 5×5 Laplacian-style edge response → |.| → 13×13 Gaussian blur
(σ=2) → global min-max normalize → invert → threshold (<0.8 → 0) → broadcast
to 3 channels.

TPU notes: the Gaussian blur is separable, so it runs as two 1D depthwise
convs instead of a 13×13 dense conv (169→26 taps); the Laplacian is a single
5×5 depthwise conv. The min/max are over the whole batch tensor, matching the
reference's tensor-global normalization (vae_trainer.py:166-168).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# reference vae_trainer.py:146-155
_LAPLACIAN_5x5 = np.array(
    [
        [0, 1, 1, 1, 0],
        [1, 1, 1, 1, 1],
        [1, 1, -20, 1, 1],
        [1, 1, 1, 1, 1],
        [0, 1, 1, 1, 0],
    ],
    dtype=np.float32,
)


@functools.lru_cache(maxsize=None)
def _gaussian_kernel_1d(ksize: int = 13, sigma: float = 2.0) -> np.ndarray:
    """Matches torchvision GaussianBlur: normalized sampled Gaussian."""
    x = np.arange(ksize, dtype=np.float32) - (ksize - 1) / 2.0
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def _conv2d_single(x: jax.Array, kernel_hw: jax.Array, pad: int) -> jax.Array:
    """Depthwise 2D conv of (B,H,W,1) with one (kh,kw) kernel, SAME-style pad."""
    kh, kw = kernel_hw.shape
    k = kernel_hw.reshape(kh, kw, 1, 1)
    return jax.lax.conv_general_dilated(
        x,
        k,
        window_strides=(1, 1),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def blurriness_heatmap(images: jax.Array) -> jax.Array:
    """(B, H, W, 3) in [-1, 1] → (B, H, W, 3) mask in [0, 1]."""
    xf = images.astype(jnp.float32)
    gray = xf.mean(axis=-1, keepdims=True)  # (B,H,W,1)
    edge = _conv2d_single(gray, jnp.asarray(_LAPLACIAN_5x5), pad=2)
    edge = jnp.abs(edge)
    g1 = jnp.asarray(_gaussian_kernel_1d())
    # separable 13×13 blur: torchvision pads with reflect... GaussianBlur uses
    # reflect padding; reference relies on it (vae_trainer.py:162).
    pad = 6
    padded = jnp.pad(edge, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
    blurred = _conv2d_single_nopad(padded, g1.reshape(-1, 1))
    blurred = _conv2d_single_nopad(blurred, g1.reshape(1, -1))
    mn = blurred.min()
    mx = blurred.max()
    norm = (blurred - mn) / (mx - mn + 1e-8)
    mask = 1.0 - norm
    mask = jnp.where(mask < 0.8, 0.0, mask)
    return jnp.broadcast_to(mask, mask.shape[:3] + (3,)).astype(images.dtype)


def _conv2d_single_nopad(x: jax.Array, kernel_hw: jax.Array) -> jax.Array:
    kh, kw = kernel_hw.shape
    k = kernel_hw.reshape(kh, kw, 1, 1)
    return jax.lax.conv_general_dilated(
        x,
        k,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
