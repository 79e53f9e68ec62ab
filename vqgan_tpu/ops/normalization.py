"""fp32 GroupNorm compute over NHWC (and NDHWC) activations.

The reference forces GroupNorm to fp32 under bf16 autocast and casts back
(ae.py:41-53, FP32GroupNorm) — a numerical-stability pattern we keep: the
reduction runs in fp32 even when the surrounding network computes in bf16.

This is a deliberate XLA-fusion target: GroupNorm's two reduction passes plus
the following swish are elementwise/reduction chains XLA fuses into the
adjacent convs; a Pallas fused groupnorm+swish kernel lives in
ops/pallas/groupnorm.py for the cases XLA leaves on the table.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def group_norm_fp32(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    num_groups: int = 32,
    eps: float = 1e-6,
) -> jax.Array:
    """GroupNorm over channel-last input, computed in fp32.

    ``x``: (B, ..., C) with channels last (NHWC / NDHWC / NC). Channels are
    grouped into ``num_groups`` contiguous chunks (torch GroupNorm semantics);
    statistics are taken per (sample, group) over all spatial positions and
    the group's channels.
    """
    c = x.shape[-1]
    if c % num_groups != 0:
        raise ValueError(f"channels {c} not divisible by num_groups {num_groups}")
    orig_dtype = x.dtype
    b = x.shape[0]
    # Statistics on a grouped VIEW (cast fuses into the reduction); the
    # normalize pass stays on the ORIGINAL layout so XLA can fuse
    # cast→normalize→affine→cast into one elementwise sweep without
    # materializing an fp32 copy of the activation in HBM (that copy was a
    # >1GB temp per call at 512px, the dominant memory cost of big configs).
    xg = x.astype(jnp.float32).reshape(b, -1, num_groups, c // num_groups)
    mean = jnp.mean(xg, axis=(1, 3))  # (B, G)
    var = jnp.mean(jnp.square(xg), axis=(1, 3)) - jnp.square(mean)
    rstd = jax.lax.rsqrt(var + eps)
    # per-channel broadcast vectors, shaped (B, 1, ..., 1, C)
    bshape = (b,) + (1,) * (x.ndim - 2) + (c,)
    mean_c = jnp.repeat(mean, c // num_groups, axis=-1).reshape(bshape)
    rstd_c = jnp.repeat(rstd, c // num_groups, axis=-1).reshape(bshape)
    y = (x.astype(jnp.float32) - mean_c) * rstd_c
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(orig_dtype)
