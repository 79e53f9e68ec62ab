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
    xf = x.astype(jnp.float32)
    b = x.shape[0]
    spatial = x.shape[1:-1]
    # (B, prod(spatial), G, C/G); reduce over spatial and intra-group channels
    xg = xf.reshape(b, -1, num_groups, c // num_groups)
    mean = jnp.mean(xg, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(xg - mean), axis=(1, 3), keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    xf = xg.reshape(b, *spatial, c)
    xf = xf * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return xf.astype(orig_dtype)
