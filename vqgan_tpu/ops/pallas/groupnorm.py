"""Pallas TPU kernel: fused fp32 GroupNorm (+ optional swish) over NHWC bf16.

Why a kernel: every ResnetBlock runs norm→swish→conv twice (reference
ae.py:124-136) with the norm forced to fp32 (ae.py:41-53). A generic schedule
reads the activation three times (mean pass, variance pass, normalize pass)
plus one write. This kernel computes per-(batch, group) sum/sum-of-squares in
ONE read (fp32 accumulation in VMEM), then a second pass applies
(x−μ)·rstd·γ+β and the swish in the same elementwise sweep: 2 reads + 1
write, with all math in fp32 and the result cast back to the input dtype —
matching the reference's FP32GroupNorm numerics.

Mosaic notes: lane-dim reshapes ((T,C)→(T,G,C/G)) are unsupported, so group
reductions/broadcasts go through a one-hot (C,G) matrix on the MXU — a
(1,C)@(C,G) contraction per tile, negligible FLOPs. Stats tensors are kept
whole in VMEM and indexed with program_id.

Falls back to interpret mode off-TPU so the same code path is unit-testable
on CPU.

Measured on v5e at 16×128×128×512 bf16 (fwd+bwd): this kernel 4.41 ms vs the
default channel-coefficient XLA formulation (ops/normalization.py) 3.91 ms —
the kernel investigation's insight (single-consumer coefficient form, bf16
residuals) was folded back into the XLA path, which XLA now fuses optimally.
The Pallas path stays as the opt-in (use_pallas_gn) explicitly-scheduled
variant and the template for future fusions.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_tile(s: int, c: int, vmem_budget: int = 4 * 1024 * 1024) -> int:
    """Largest power-of-two spatial tile dividing s that fits the budget."""
    t = 1
    while (
        t < s
        and s % (t * 2) == 0
        and (t * 2) * c * 4 * 2 <= vmem_budget  # fp32 x + headroom
    ):
        t *= 2
    return t


def _group_onehot(c: int, g: int, dtype=jnp.float32) -> jax.Array:
    """(C, G) one-hot: M[ch, grp] = 1 iff ch // (C/G) == grp."""
    cg = c // g
    ch = jax.lax.broadcasted_iota(jnp.int32, (c, g), 0)
    gr = jax.lax.broadcasted_iota(jnp.int32, (c, g), 1)
    return ((ch // cg) == gr).astype(dtype)


def _stats_kernel(x_ref, out_ref, *, num_groups: int):
    x = x_ref[0].astype(jnp.float32)  # (T, C)
    t, c = x.shape
    onehot = _group_onehot(c, num_groups)
    s1_c = jnp.sum(x, axis=0, keepdims=True)  # (1, C)
    s2_c = jnp.sum(x * x, axis=0, keepdims=True)
    s1 = jnp.dot(s1_c, onehot, preferred_element_type=jnp.float32)  # (1, G)
    s2 = jnp.dot(s2_c, onehot, preferred_element_type=jnp.float32)
    out_ref[0, 0] = jnp.concatenate([s1, s2], axis=0)  # (2, G)


def _apply_kernel(x_ref, mean_ref, rstd_ref, scale_ref, bias_ref, out_ref, *,
                  num_groups: int, with_swish: bool):
    x = x_ref[0].astype(jnp.float32)  # (T, C)
    t, c = x.shape
    i = pl.program_id(0)  # batch index; stats arrays are whole in VMEM
    onehot_t = _group_onehot(c, num_groups).T  # (G, C)
    mean_c = jnp.dot(
        mean_ref[pl.ds(i, 1), :], onehot_t, preferred_element_type=jnp.float32
    )  # (1, C)
    rstd_c = jnp.dot(
        rstd_ref[pl.ds(i, 1), :], onehot_t, preferred_element_type=jnp.float32
    )
    y = (x - mean_c) * rstd_c
    y = y * scale_ref[:].astype(jnp.float32) + bias_ref[:].astype(jnp.float32)
    if with_swish:
        y = y * jax.nn.sigmoid(y)
    out_ref[0] = y.astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("num_groups", "eps", "with_swish", "interpret")
)
def fused_group_norm(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    num_groups: int = 32,
    eps: float = 1e-6,
    with_swish: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """GroupNorm(+swish) over channel-last x of shape (B, ..., C)."""
    orig_shape = x.shape
    b, c = x.shape[0], x.shape[-1]
    assert c % num_groups == 0, (c, num_groups)
    s = 1
    for d in x.shape[1:-1]:
        s *= d
    xs = x.reshape(b, s, c)
    tile = _pick_tile(s, c)
    n_tiles = s // tile
    g = num_groups

    partial = pl.pallas_call(
        functools.partial(_stats_kernel, num_groups=g),
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, tile, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 2, g), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_tiles, 2, g), jnp.float32),
        interpret=interpret,
    )(xs)

    sums = partial.sum(axis=1)  # (B, 2, G)
    n = s * (c // g)
    mean = sums[:, 0, :] / n  # (B, G)
    var = sums[:, 1, :] / n - mean * mean
    rstd = jax.lax.rsqrt(var + eps)

    out = pl.pallas_call(
        functools.partial(_apply_kernel, num_groups=g, with_swish=with_swish),
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, tile, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            # stats/affine params are tiny — keep the whole arrays resident
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s, c), x.dtype),
        interpret=interpret,
    )(xs, mean, rstd, scale.reshape(1, c), bias.reshape(1, c))

    return out.reshape(orig_shape)


# ---------------------------------------------------------------------------
# backward kernels: same streaming structure as the forward —
# pass 1 accumulates per-channel Σdŷ and Σdŷ·x (recomputing dŷ from (g, x)
# and the per-(B,C) affine coefficients when swish is fused), a small host
# reduction turns them into dγ/dβ and the dx coefficients, and pass 2 writes
# dx = dŷ·ca + x·cb + cc in one sweep. No full-size fp32 residuals anywhere.
# ---------------------------------------------------------------------------


def _d_yhat(x, g, a_row, b_row, with_swish):
    gf = g.astype(jnp.float32)
    if not with_swish:
        return gf
    y_hat = x.astype(jnp.float32) * a_row + b_row
    sig = jax.nn.sigmoid(y_hat)
    return gf * sig * (1.0 + y_hat * (1.0 - sig))


def _bwd_stats_kernel(x_ref, g_ref, a_ref, b_ref, out_ref, *, with_swish):
    i = pl.program_id(0)
    x = x_ref[0]
    dy = _d_yhat(x, g_ref[0], a_ref[pl.ds(i, 1), :], b_ref[pl.ds(i, 1), :],
                 with_swish)
    s0 = jnp.sum(dy, axis=0, keepdims=True)  # (1, C)
    s1 = jnp.sum(dy * x.astype(jnp.float32), axis=0, keepdims=True)
    out_ref[0, 0] = jnp.concatenate([s0, s1], axis=0)  # (2, C)


def _bwd_dx_kernel(x_ref, g_ref, a_ref, b_ref, ca_ref, cb_ref, cc_ref,
                   out_ref, *, with_swish):
    i = pl.program_id(0)
    x = x_ref[0]
    dy = _d_yhat(x, g_ref[0], a_ref[pl.ds(i, 1), :], b_ref[pl.ds(i, 1), :],
                 with_swish)
    dx = (
        dy * ca_ref[pl.ds(i, 1), :]
        + x.astype(jnp.float32) * cb_ref[pl.ds(i, 1), :]
        + cc_ref[pl.ds(i, 1), :]
    )
    out_ref[0] = dx.astype(out_ref.dtype)


def _pallas_gn_bwd(x, g, mean, rstd, scale, bias, num_groups, with_swish,
                   interpret):
    orig_shape = x.shape
    b, c = x.shape[0], x.shape[-1]
    s = 1
    for d in x.shape[1:-1]:
        s *= d
    xs = x.reshape(b, s, c)
    gs = g.reshape(b, s, c)
    tile = _pick_tile(s, c)
    n_tiles = s // tile
    cg = c // num_groups

    # per-(B, C) affine coefficients (ŷ = x·a + b)
    r_c = jnp.repeat(rstd, cg, axis=-1)  # (B, C)
    m_c = jnp.repeat(mean, cg, axis=-1)
    scale_f = scale.astype(jnp.float32)[None, :]
    a = r_c * scale_f
    bb = bias.astype(jnp.float32)[None, :] - m_c * a

    big_spec = pl.BlockSpec((1, tile, c), lambda i, j: (i, j, 0),
                            memory_space=pltpu.VMEM)
    whole = pl.BlockSpec(memory_space=pltpu.VMEM)

    partial = pl.pallas_call(
        functools.partial(_bwd_stats_kernel, with_swish=with_swish),
        grid=(b, n_tiles),
        in_specs=[big_spec, big_spec, whole, whole],
        out_specs=pl.BlockSpec((1, 1, 2, c), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_tiles, 2, c), jnp.float32),
        interpret=interpret,
    )(xs, gs, a, bb)
    sums = partial.sum(axis=1)  # (B, 2, C)
    s0, s1 = sums[:, 0, :], sums[:, 1, :]

    d_scale = jnp.sum(r_c * (s1 - m_c * s0), axis=0)
    d_bias = jnp.sum(s0, axis=0)

    n_group = s * cg
    g_s0 = jnp.sum((scale_f * s0).reshape(b, num_groups, cg), axis=-1)
    g_s1 = jnp.sum((scale_f * s1).reshape(b, num_groups, cg), axis=-1)
    m1 = g_s0 / n_group  # (B, G)
    m2 = rstd * (g_s1 / n_group) - mean * rstd * (g_s0 / n_group)
    m1_c = jnp.repeat(m1, cg, axis=-1)
    m2_c = jnp.repeat(m2, cg, axis=-1)
    ca = r_c * scale_f
    cb = -r_c * r_c * m2_c
    cc = m_c * r_c * r_c * m2_c - r_c * m1_c

    dx = pl.pallas_call(
        functools.partial(_bwd_dx_kernel, with_swish=with_swish),
        grid=(b, n_tiles),
        in_specs=[big_spec, big_spec, whole, whole, whole, whole, whole],
        out_specs=big_spec,
        out_shape=jax.ShapeDtypeStruct((b, s, c), x.dtype),
        interpret=interpret,
    )(xs, gs, a, bb, ca, cb, cc)

    return (
        dx.reshape(orig_shape),
        d_scale.astype(scale.dtype),
        d_bias.astype(bias.dtype),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _fused_gn_vjp(x, scale, bias, num_groups, eps, with_swish, interpret):
    return fused_group_norm(
        x, scale, bias, num_groups, eps, with_swish, interpret=interpret
    )


def _fused_gn_fwd(x, scale, bias, num_groups, eps, with_swish, interpret):
    out = fused_group_norm(
        x, scale, bias, num_groups, eps, with_swish, interpret=interpret
    )
    # recompute the tiny per-(B,G) stats for the residuals (one cheap
    # reduction; avoids plumbing extra outputs through the forward)
    from vqgan_tpu.ops.normalization import _moments

    mean, var = _moments(x, num_groups)
    rstd = jax.lax.rsqrt(var + eps)
    return out, (x, scale, bias, mean, rstd)


def _fused_gn_bwd(num_groups, eps, with_swish, interpret, res, g):
    x, scale, bias, mean, rstd = res
    return _pallas_gn_bwd(
        x, g, mean, rstd, scale, bias, num_groups, with_swish, interpret
    )


_fused_gn_vjp.defvjp(_fused_gn_fwd, _fused_gn_bwd)


def group_norm_swish_auto(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    num_groups: int = 32,
    eps: float = 1e-6,
    with_swish: bool = True,
) -> jax.Array:
    """Differentiable fused GroupNorm(+swish): Pallas forward on TPU
    (interpret mode elsewhere), XLA-derived backward."""
    on_tpu = jax.devices()[0].platform == "tpu"
    return _fused_gn_vjp(
        x, scale, bias, num_groups, eps, with_swish, not on_tpu
    )
