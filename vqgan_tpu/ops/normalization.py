"""fp32 GroupNorm (+ optional fused swish) over channel-last activations,
with a memory-lean custom VJP.

The reference forces GroupNorm to fp32 under bf16 autocast and casts back
(ae.py:41-53, FP32GroupNorm) — we keep that numerics contract (statistics and
arithmetic in fp32). The implementation is written in **channel-coefficient
form** so XLA never materializes a full-size fp32 tensor:

    y = x · A_c + B_c ,  A = rstd·γ ,  B = β − μ·rstd·γ      (A, B: (B, C))

Every full-size operation is then a single-consumer elementwise chain over
the bf16 input (cast folds into the fused loop); only (B, G)/(B, C) vectors
live in fp32. Naive formulations (normalize on an fp32 copy) were measured to
allocate >1GB fp32 temporaries per call at 512px — the dominant HBM cost of
large configs.

The custom VJP stores only the bf16 input and the per-(batch, group)
mean/rstd, and expresses the backward in the same coefficient form:

    dx = dŷ·(rγ)_c + x·(−r²·m2)_c + (μ·r²·m2 − r·m1)_c
    m1 = mean_g(γ·dŷ) ,  m2 = r·mean_g(γ·dŷ·x) − μ·r·mean_g(γ·dŷ)
    dγ_c = Σ_b r·(S1 − μ·S0) ,  dβ_c = Σ_b S0 ,
    S1 = Σ_sp dŷ·x ,  S0 = Σ_sp dŷ

With fused swish, dŷ is materialized once in the input dtype (bf16) so the
four reductions and the dx sweep share it without an fp32 copy; reductions
still accumulate in fp32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _moments(x: jax.Array, num_groups: int):
    """Per-(batch, group) mean and variance, fp32 accumulation."""
    b, c = x.shape[0], x.shape[-1]
    xg = x.astype(jnp.float32).reshape(b, -1, num_groups, c // num_groups)
    mean = jnp.mean(xg, axis=(1, 3))  # (B, G)
    var = jnp.mean(jnp.square(xg), axis=(1, 3)) - jnp.square(mean)
    return mean, var


def _bc(vec_bc: jax.Array, x_shape) -> jax.Array:
    """(B, C) → broadcastable (B, 1, ..., 1, C)."""
    b, c = x_shape[0], x_shape[-1]
    return vec_bc.reshape((b,) + (1,) * (len(x_shape) - 2) + (c,))


def _expand(stat_bg: jax.Array, c: int, num_groups: int) -> jax.Array:
    """(B, G) → (B, C) by repeating within groups."""
    return jnp.repeat(stat_bg, c // num_groups, axis=-1)


def _coeffs(mean, rstd, scale, bias, c, num_groups):
    """A = rstd·γ, B = β − μ·rstd·γ as (B, C) fp32."""
    r_c = _expand(rstd, c, num_groups)
    m_c = _expand(mean, c, num_groups)
    a = r_c * scale.astype(jnp.float32)[None, :]
    b = bias.astype(jnp.float32)[None, :] - m_c * a
    return a, b


def _forward(x, scale, bias, num_groups, eps, with_swish):
    c = x.shape[-1]
    mean, var = _moments(x, num_groups)
    rstd = jax.lax.rsqrt(var + eps)
    a, b = _coeffs(mean, rstd, scale, bias, c, num_groups)
    y = x.astype(jnp.float32) * _bc(a, x.shape) + _bc(b, x.shape)
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
    a, bb = _coeffs(mean, rstd, scale, bias, c, num_groups)
    a_full = _bc(a, x.shape)
    b_full = _bc(bb, x.shape)

    if with_swish:
        # ŷ recomputed on the fly; dŷ stored once in the input dtype so the
        # reductions below share it without an fp32 materialization
        y_hat = x.astype(jnp.float32) * a_full + b_full
        sig = jax.nn.sigmoid(y_hat)
        d_yhat = (
            g.astype(jnp.float32) * sig * (1.0 + y_hat * (1.0 - sig))
        ).astype(x.dtype)
    else:
        d_yhat = g

    dyf = lambda: d_yhat.astype(jnp.float32)  # cast folds into each fusion
    xf = lambda: x.astype(jnp.float32)

    # per-(B, C) fp32 reductions over spatial
    s0 = jnp.sum(dyf(), axis=n_axes)  # (B, C)
    s1 = jnp.sum(dyf() * xf(), axis=n_axes)  # (B, C)

    r_c = _expand(rstd, c, num_groups)  # (B, C)
    m_c = _expand(mean, c, num_groups)
    scale_f = scale.astype(jnp.float32)[None, :]

    # dγ, dβ
    d_scale = jnp.sum(r_c * (s1 - m_c * s0), axis=0)
    d_bias = jnp.sum(s0, axis=0)

    # per-(B, G) means of γ·dŷ and γ·dŷ·x̂ from the (B, C) sums
    cg = c // num_groups
    n = 1
    for d in x.shape[1:-1]:
        n *= d
    n_group = n * cg

    def gsum(t_bc):  # (B, C) → (B, G)
        return jnp.sum(t_bc.reshape(b, num_groups, cg), axis=-1)

    g_s0 = gsum(scale_f * s0)  # Σ γ·dŷ per group
    g_s1 = gsum(scale_f * s1)  # Σ γ·dŷ·x per group
    m1 = g_s0 / n_group  # (B, G)
    m2 = rstd * (g_s1 / n_group) - mean * rstd * (g_s0 / n_group)

    # dx = dŷ·(rγ) + x·(−r²m2) + (μ·r²·m2 − r·m1) — channel coefficients
    m1_c = _expand(m1, c, num_groups)
    m2_c = _expand(m2, c, num_groups)
    ca = r_c * scale_f  # coefficient of dŷ
    cb = -r_c * r_c * m2_c  # coefficient of x
    cc = m_c * r_c * r_c * m2_c - r_c * m1_c  # constant
    dx = (
        dyf() * _bc(ca, x.shape) + xf() * _bc(cb, x.shape) + _bc(cc, x.shape)
    ).astype(x.dtype)
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
    channel-grouping semantics; fp32 statistics/arithmetic, input-dtype
    storage."""
    c = x.shape[-1]
    if c % num_groups != 0:
        raise ValueError(f"channels {c} not divisible by num_groups {num_groups}")
    return _group_norm(x, scale, bias, num_groups, eps, with_swish)
