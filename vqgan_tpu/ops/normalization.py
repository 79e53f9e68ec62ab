"""fp32 GroupNorm (+ optional fused swish) over channel-last activations,
with a memory-lean custom VJP.

The reference forces GroupNorm to fp32 under bf16 autocast and casts back
(ae.py:41-53, FP32GroupNorm) — we keep that numerics contract. Naive autodiff
of that pattern saves full-size fp32 residuals (the normalized activation)
for the backward: >1GB per call at 512px, the dominant HBM cost of large
configs. The custom VJP here saves only the ORIGINAL (bf16) input plus the
per-(batch, group) mean/rstd, and recomputes x̂ on the fly inside fused
fp32 sweeps in the backward:

  dŷ  = g · swish'(ŷ)            (when fused swish; ŷ recomputed from x)
  dγ  = Σ dŷ·x̂ ,  dβ = Σ dŷ
  dx  = rstd · (dŷ·γ − mean_g(dŷ·γ) − x̂ · mean_g(dŷ·γ·x̂))

All math in fp32, storage in the input dtype.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _moments(x: jax.Array, num_groups: int):
    """Per-(batch, group) mean and variance in fp32. x: (B, ..., C)."""
    b, c = x.shape[0], x.shape[-1]
    xg = x.astype(jnp.float32).reshape(b, -1, num_groups, c // num_groups)
    mean = jnp.mean(xg, axis=(1, 3))  # (B, G)
    var = jnp.mean(jnp.square(xg), axis=(1, 3)) - jnp.square(mean)
    return mean, var


def _per_channel(stat: jax.Array, x_shape, num_groups: int) -> jax.Array:
    """(B, G) → broadcastable (B, 1, ..., 1, C)."""
    b, c = x_shape[0], x_shape[-1]
    bshape = (b,) + (1,) * (len(x_shape) - 2) + (c,)
    return jnp.repeat(stat, c // num_groups, axis=-1).reshape(bshape)


def _forward(x, scale, bias, num_groups, eps, with_swish):
    mean, var = _moments(x, num_groups)
    rstd = jax.lax.rsqrt(var + eps)
    mean_c = _per_channel(mean, x.shape, num_groups)
    rstd_c = _per_channel(rstd, x.shape, num_groups)
    xf = x.astype(jnp.float32)
    y = (xf - mean_c) * rstd_c * scale.astype(jnp.float32) + bias.astype(
        jnp.float32
    )
    if with_swish:
        y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype), (mean, rstd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _group_norm(x, scale, bias, num_groups, eps, with_swish):
    return _forward(x, scale, bias, num_groups, eps, with_swish)[0]


def _group_norm_fwd(x, scale, bias, num_groups, eps, with_swish):
    out, (mean, rstd) = _forward(x, scale, bias, num_groups, eps, with_swish)
    # residuals: bf16 x + (B,G) stats + (C,) affine — no full-size fp32 saves
    return out, (x, scale, bias, mean, rstd)


def _group_norm_bwd(num_groups, eps, with_swish, res, g):
    x, scale, bias, mean, rstd = res
    b, c = x.shape[0], x.shape[-1]
    n_axes = tuple(range(1, x.ndim - 1))
    mean_c = _per_channel(mean, x.shape, num_groups)
    rstd_c = _per_channel(rstd, x.shape, num_groups)
    xf = x.astype(jnp.float32)
    x_hat = (xf - mean_c) * rstd_c
    gf = g.astype(jnp.float32)
    scale_f = scale.astype(jnp.float32)

    if with_swish:
        y_hat = x_hat * scale_f + bias.astype(jnp.float32)
        sig = jax.nn.sigmoid(y_hat)
        d_yhat = gf * sig * (1.0 + y_hat * (1.0 - sig))
    else:
        d_yhat = gf

    reduce_axes = (0,) + n_axes  # sum over batch and spatial → (C,)
    d_scale = jnp.sum(d_yhat * x_hat, axis=reduce_axes)
    d_bias = jnp.sum(d_yhat, axis=reduce_axes)

    d_xhat = d_yhat * scale_f
    # per-(b, g) means over the group's N = spatial × C/G elements
    def group_mean(t):
        tg = t.reshape(b, -1, num_groups, c // num_groups)
        return jnp.mean(tg, axis=(1, 3))  # (B, G)

    m1 = _per_channel(group_mean(d_xhat), x.shape, num_groups)
    m2 = _per_channel(group_mean(d_xhat * x_hat), x.shape, num_groups)
    dx = (rstd_c * (d_xhat - m1 - x_hat * m2)).astype(x.dtype)
    return dx, d_scale.astype(scale.dtype), d_bias.astype(bias.dtype)


_group_norm.defvjp(_group_norm_fwd, _group_norm_bwd)


def group_norm_fp32(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    num_groups: int = 32,
    eps: float = 1e-6,
    with_swish: bool = False,
) -> jax.Array:
    """GroupNorm(+swish) over channel-last input (B, ..., C); torch GroupNorm
    channel-grouping semantics; fp32 compute, input-dtype storage."""
    c = x.shape[-1]
    if c % num_groups != 0:
        raise ValueError(f"channels {c} not divisible by num_groups {num_groups}")
    return _group_norm(x, scale, bias, num_groups, eps, with_swish)
