"""Image resizing ops over NHWC, mapped to TPU-friendly reshapes.

Torch's ``F.interpolate(mode="area")`` (used by the reference at
vae_trainer.py:531-533, 183-187) is exactly average pooling for integer
downscale factors — on TPU we express it as a reshape+mean, which XLA lowers
to a cheap reduction, instead of a gather-based generic resize. Nearest 2×
upsampling (ae.py:165) is a broadcast+reshape.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def area_downsample(x: jax.Array, factor: int) -> jax.Array:
    """Average-pool downsample NHWC by an integer factor (== torch 'area')."""
    b, h, w, c = x.shape
    if h % factor or w % factor:
        raise ValueError(f"spatial dims {(h, w)} not divisible by {factor}")
    x = x.reshape(b, h // factor, factor, w // factor, factor, c)
    return x.mean(axis=(2, 4))


def resize_area(x: jax.Array, size: tuple[int, int]) -> jax.Array:
    """Area-resize NHWC to ``size``; exact avgpool path for integer factors,
    jax.image fallback otherwise."""
    b, h, w, c = x.shape
    th, tw = size
    if h == th and w == tw:
        return x
    if h % th == 0 and w % tw == 0 and h // th == w // tw:
        return area_downsample(x, h // th)
    return jax.image.resize(x, (b, th, tw, c), method="linear")


def nearest_upsample_2x(x: jax.Array) -> jax.Array:
    """Nearest-neighbor 2× upsample of NHWC (== torch interpolate nearest)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


def nearest_upsample_2x_3d(x: jax.Array) -> jax.Array:
    """Nearest 2× upsample of NDHWC in all three spatio-temporal dims
    (reference tae.py:115)."""
    b, t, h, w, c = x.shape
    x = jnp.broadcast_to(
        x[:, :, None, :, None, :, None, :], (b, t, 2, h, 2, w, 2, c)
    )
    return x.reshape(b, 2 * t, 2 * h, 2 * w, c)
