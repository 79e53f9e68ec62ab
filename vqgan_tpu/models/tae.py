"""3D video VAE ("TVAE") — NDHWC Conv3D rebuild of reference tae.py.

Differences from the 2D family, matching the reference:
  - Conv3d everywhere, downsample stride-2 over (T, H, W) with asymmetric
    (0,1) padding on all three dims (tae.py:101-102), nearest 2× upsample in
    all three dims (tae.py:115),
  - attention has a fixed 8 heads with head_dim = C/8 (tae.py:17-18),
  - encoder emits 2·z_channels for a *real* reparameterized DiagonalGaussian
    (tae.py:165-167, 253-266),
  - standard torch init (no near-zero conv2, biases not zeroed) —
    tae.py:57-90 uses defaults.

TPU notes: NDHWC is the layout XLA's TPU conv emitter expects; 3D convs
lower to contractions over (kt·kh·kw·Cin) on the MXU. For long videos the
natural scale-out is sharding T over a mesh axis; halo exchange is inserted
by XLA's SPMD partitioner when the activation sharding is annotated.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vqgan_tpu.config import DTYPES, TVAEConfig
from vqgan_tpu.models.ae import DiagonalGaussian
from vqgan_tpu.models.blocks import (
    remat_with_policy,
    tag_saveable,
    torch_conv_kernel_init,
)
from vqgan_tpu.models.quant import VectorQuantizer
from vqgan_tpu.ops.normalization import group_norm_fp32
from vqgan_tpu.ops.resize import nearest_upsample_2x_3d

Dtype = Any


def _remat(cls, policy: str):
    """nn.remat with the configured residual policy: "full" recomputes
    everything; "conv" saves the tagged conv outputs and recomputes only
    the cheap elementwise chains — measured +16% at 16f/128px and +12% at
    48f/256px on the HBM-bound 3D step (BASELINE.md "selective remat")."""
    return remat_with_policy(cls, policy, "tae_conv")


def _tag(x: jax.Array) -> jax.Array:
    return tag_saveable(x, "tae_conv")


# torch Conv3d default bias init: U(±1/sqrt(fan_in)); tae.py does not zero
# biases, unlike ae.py.
def _torch_bias_init(fan_in: int):
    bound = 1.0 / (fan_in ** 0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class Conv3DTap2D(nn.Module):
    """3×3×3 stride-1 Conv3d computed as three temporal taps of 2D convs:
    ``y[t] = Σ_{dt∈{0,1,2}} conv2d(x[t+dt-1], kernel[dt])`` over the
    (B·T, H, W, C) flattening, with zero SAME padding on T.

    Same parameter tensors as ``nn.Conv`` ((3,3,3,Ci,Co) ``kernel`` +
    ``bias`` — checkpoint/torch-import parity preserved) and the same math
    up to summation order. The point is MXU tiling: XLA maps the batched
    2D convs far better than the narrow-channel 3D convs that dominate the
    video step (trace: 3D conv fusions 65% of time at 33–66 TF/s;
    BASELINE.md "conv3d_impl"). Select with ``TVAEConfig.conv3d_impl``.
    """

    features: int
    dtype: Dtype
    fan_in: int
    use_bias: bool = True
    kernel_init: Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        ci = x.shape[-1]
        kernel = self.param(
            "kernel",
            self.kernel_init or torch_conv_kernel_init,
            (3, 3, 3, ci, self.features),
            jnp.float32,
        )
        k = kernel.astype(self.dtype)
        xd = x.astype(self.dtype)
        b, t, h, w, _ = x.shape
        xt = xd.reshape(b * t, h, w, ci)
        dn = ("NHWC", "HWIO", "NHWC")
        taps = [
            jax.lax.conv_general_dilated(
                xt, k[dt], (1, 1), "SAME", dimension_numbers=dn
            ).reshape(b, t, h, w, self.features)
            for dt in range(3)
        ]
        z = jnp.zeros_like(taps[0][:, :1])
        out = (
            jnp.concatenate([z, taps[0][:, :-1]], 1)
            + taps[1]
            + jnp.concatenate([taps[2][:, 1:], z], 1)
        )
        if self.use_bias:
            bias = self.param(
                "bias", _torch_bias_init(self.fan_in), (self.features,),
                jnp.float32,
            )
            out = out + bias.astype(out.dtype)
        return out


class Conv3DTap2DStride2(nn.Module):
    """Stride-2 VALID 3×3×3 Conv3d as three temporal taps of stride-2 2D
    convs: ``y[t'] = Σ_dt conv2d_s2(x[2t'+dt], kernel[dt])`` — the
    Downsample3D counterpart of Conv3DTap2D (same parameter tensors, same
    math up to summation order)."""

    features: int
    dtype: Dtype
    fan_in: int
    use_bias: bool = True
    kernel_init: Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        ci = x.shape[-1]
        kernel = self.param(
            "kernel",
            self.kernel_init or torch_conv_kernel_init,
            (3, 3, 3, ci, self.features),
            jnp.float32,
        )
        k = kernel.astype(self.dtype)
        xd = x.astype(self.dtype)
        b, t, h, w, _ = x.shape
        t_out = (t - 3) // 2 + 1
        dn = ("NHWC", "HWIO", "NHWC")
        out = None
        for dt in range(3):
            x_dt = xd[:, dt : dt + 2 * (t_out - 1) + 1 : 2]
            xt = x_dt.reshape(b * t_out, h, w, ci)
            y = jax.lax.conv_general_dilated(
                xt, k[dt], (2, 2), "VALID", dimension_numbers=dn
            )
            y = y.reshape(b, t_out, y.shape[1], y.shape[2], self.features)
            out = y if out is None else out + y
        if self.use_bias:
            bias = self.param(
                "bias", _torch_bias_init(self.fan_in), (self.features,),
                jnp.float32,
            )
            out = out + bias.astype(out.dtype)
        return out


class Conv3DTap2DFat(nn.Module):
    """Conv3DTap2D with all three temporal taps computed by ONE 2D conv of
    3·Co output channels (kernel viewed as (3,3,Ci,3·Co), kt folded into
    out-channels), combined by a pad+slice+add over T. Versus the three-conv
    tap2d form this reads the activation once instead of three times and
    lets XLA fuse the temporal shifts into a single loop fusion — the tap2d
    trace showed 20% of step time in data formatting (the zero-concat
    output shifts) on an HBM-bound step. Same parameter tensors, same math
    up to summation order."""

    features: int
    dtype: Dtype
    fan_in: int
    use_bias: bool = True
    kernel_init: Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        ci = x.shape[-1]
        co = self.features
        kernel = self.param(
            "kernel",
            self.kernel_init or torch_conv_kernel_init,
            (3, 3, 3, ci, co),
            jnp.float32,
        )
        # (kt,kh,kw,ci,co) -> (kh,kw,ci,kt*co): tap dt lives at [dt*co:(dt+1)*co]
        kf = jnp.transpose(kernel.astype(self.dtype), (1, 2, 3, 0, 4))
        kf = kf.reshape(3, 3, ci, 3 * co)
        xd = x.astype(self.dtype)
        b, t, h, w, _ = x.shape
        y = jax.lax.conv_general_dilated(
            xd.reshape(b * t, h, w, ci), kf, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ).reshape(b, t, h, w, 3 * co)
        # out[t] = y[t-1, tap0] + y[t, tap1] + y[t+1, tap2], zero boundaries
        yp = jnp.pad(y, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
        out = (
            yp[:, 0:t, :, :, 0:co]
            + yp[:, 1 : t + 1, :, :, co : 2 * co]
            + yp[:, 2 : t + 2, :, :, 2 * co : 3 * co]
        )
        if self.use_bias:
            bias = self.param(
                "bias", _torch_bias_init(self.fan_in), (co,), jnp.float32,
            )
            out = out + bias.astype(out.dtype)
        return out


class Conv3DTap2DStride2Fat(nn.Module):
    """Stride-2 VALID counterpart of Conv3DTap2DFat via a parity split:
    even input frames feed taps 0 and 2 (one 2·Co-wide stride-2 2D conv),
    odd frames feed tap 1 — exactly the frame-conv FLOPs the stride-2
    output needs, with each input frame read once."""

    features: int
    dtype: Dtype
    fan_in: int
    use_bias: bool = True
    kernel_init: Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        ci = x.shape[-1]
        co = self.features
        kernel = self.param(
            "kernel",
            self.kernel_init or torch_conv_kernel_init,
            (3, 3, 3, ci, co),
            jnp.float32,
        )
        k = kernel.astype(self.dtype)
        xd = x.astype(self.dtype)
        b, t, h, w, _ = x.shape
        t_out = (t - 3) // 2 + 1
        dn = ("NHWC", "HWIO", "NHWC")
        k_even = jnp.concatenate([k[0], k[2]], axis=-1)  # (3,3,ci,2co)
        n_even = (t + 1) // 2
        n_odd = t // 2
        xe = xd[:, 0 : 2 * n_even : 2].reshape(b * n_even, h, w, ci)
        xo = xd[:, 1 : 2 * n_odd : 2].reshape(b * n_odd, h, w, ci)
        ye = jax.lax.conv_general_dilated(xe, k_even, (2, 2), "VALID",
                                          dimension_numbers=dn)
        yo = jax.lax.conv_general_dilated(xo, k[1], (2, 2), "VALID",
                                          dimension_numbers=dn)
        ho, wo = ye.shape[1], ye.shape[2]
        ye = ye.reshape(b, n_even, ho, wo, 2 * co)
        yo = yo.reshape(b, n_odd, ho, wo, co)
        # out[t'] = ye[t', tap0] + yo[t', tap1] + ye[t'+1, tap2]
        out = (
            ye[:, :t_out, :, :, 0:co]
            + yo[:, :t_out]
            + ye[:, 1 : t_out + 1, :, :, co : 2 * co]
        )
        if self.use_bias:
            bias = self.param(
                "bias", _torch_bias_init(self.fan_in), (co,), jnp.float32,
            )
            out = out + bias.astype(out.dtype)
        return out


class Conv3DTapPallas(nn.Module):
    """Conv3DTap2DFat with the temporal-tap sum fused INTO the conv via the
    Pallas kernel (ops/pallas/conv3d.py): the 3·Co intermediate and its
    shifted re-read — 23% of the HBM-bound 3D step as pure data formatting
    (BASELINE.md r4 trace) — never exist; the output is written once, Co
    wide, with fp32 cross-tap accumulation. Same (3,3,3,Ci,Co) parameter
    tensor and zero-T-SAME math as every other impl (reference tae.py:57-76).
    Interpret mode off-TPU keeps the path CPU-testable."""

    features: int
    dtype: Dtype
    fan_in: int
    use_bias: bool = True
    kernel_init: Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from vqgan_tpu.ops.pallas.conv3d import conv3d_ttap

        ci = x.shape[-1]
        kernel = self.param(
            "kernel",
            self.kernel_init or torch_conv_kernel_init,
            (3, 3, 3, ci, self.features),
            jnp.float32,
        )
        out = conv3d_ttap(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            jax.default_backend() != "tpu",
        )
        if self.use_bias:
            bias = self.param(
                "bias", _torch_bias_init(self.fan_in), (self.features,),
                jnp.float32,
            )
            out = out + bias.astype(out.dtype)
        return out


def conv3d(
    features: int,
    kernel: int,
    dtype: Dtype,
    fan_in: int,
    strides: int = 1,
    padding="SAME",
    use_bias: bool = True,
    kernel_init=None,
    name: str | None = None,
    impl: str = "direct",
):
    if impl == "auto":
        # round-4 matrix at 16f/128px (remat+conv policy, BASELINE.md r4):
        # tap2dfat 246 f/s vs tap2d 208 (+18%) — the single-conv 3·Co form
        # reads the activation once and fuses the temporal shifts. At the
        # 48f/256px long-clip config tap2d is ~4% ahead (40.8 vs 39.2);
        # pass --conv3d_impl tap2d there. "direct" elsewhere (CPU tests,
        # jax.export artifacts).
        impl = "tap2dfat" if jax.default_backend() == "tpu" else "direct"
    if impl == "mixed":
        # Per-channel-count split, settled by tools/bench_conv3d_levels.py
        # on the real chip (BASELINE.md round 5): the Pallas fused-tap
        # kernel's dots run N=Co lanes, so at Co=64 the MXU is half-filled
        # and tap2dfat's N=3·Co fat conv wins (42.3 vs 37.8 TF/s fwd+bwd);
        # at Co>=128 both fill the lanes and the kernel's ~1.5x-lower HBM
        # traffic wins in isolation (128ch: 71.8 vs 62.2; 256ch: 45.2 vs
        # 42.5). End-to-end, though, mixed measures 239.7 f/s vs tap2dfat's
        # 246.3 at 16f/128px: the isolated wins are eaten by the fusion
        # boundary — XLA fuses the norm/silu chains into its own convs but
        # cannot fuse across a pallas_call, so each kernel conv adds an
        # activation round-trip on an HBM-bound step. Kept as an opt-in;
        # "auto" stays tap2dfat (the measured end-to-end best).
        ci = fan_in // 27
        impl = (
            "pallas"
            if kernel == 3 and strides == 1 and min(ci, features) >= 128
            else "tap2dfat"
        )
    if kernel == 3 and strides == 1 and padding == "SAME":
        cls = {
            "tap2d": Conv3DTap2D,
            "tap2dfat": Conv3DTap2DFat,
            "pallas": Conv3DTapPallas,
        }.get(impl)
        if cls is not None:
            return cls(
                features=features,
                dtype=dtype,
                fan_in=fan_in,
                use_bias=use_bias,
                kernel_init=kernel_init,
                name=name,
            )
    if kernel == 3 and strides == 2 and padding == "VALID":
        cls = {
            "tap2d": Conv3DTap2DStride2,
            "tap2dfat": Conv3DTap2DStride2Fat,
            # the Pallas kernel covers the stride-1 bulk; the encoder's few
            # stride-2 downsamples keep the measured-best fat lowering
            "pallas": Conv3DTap2DStride2Fat,
        }.get(impl)
        if cls is not None:
            return cls(
                features=features,
                dtype=dtype,
                fan_in=fan_in,
                use_bias=use_bias,
                kernel_init=kernel_init,
                name=name,
            )
    if impl not in ("direct", "tap2d", "tap2dfat", "pallas"):
        raise ValueError(f"unknown conv3d_impl {impl!r}")
    return nn.Conv(
        features,
        (kernel,) * 3,
        strides=(strides,) * 3,
        padding=padding,
        use_bias=use_bias,
        kernel_init=kernel_init or torch_conv_kernel_init,
        bias_init=_torch_bias_init(fan_in),
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


class GroupNorm3D(nn.Module):
    """fp32 GroupNorm; ``fused_swish`` folds the following silu into the
    op's single elementwise sweep (ops/normalization.py) — the 2D family's
    norm→silu fusion (models/blocks.py), ported because the 3D step is
    HBM-bound (BASELINE.md: 78.5% HBM at 19.4% FLOP peak) and every saved
    full-size activation pass is throughput."""

    num_groups: int = 32
    eps: float = 1e-6
    fused_swish: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return group_norm_fp32(
            x, scale, bias, self.num_groups, self.eps,
            with_swish=self.fused_swish,
        )


class ResnetBlock3D(nn.Module):
    out_channels: int
    dtype: Dtype = jnp.float32
    fused_swish: bool = True
    conv3d_impl: str = "direct"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c_in = x.shape[-1]
        fs = self.fused_swish
        ci = self.conv3d_impl
        h = GroupNorm3D(name="norm1", fused_swish=fs)(x)
        if not fs:
            h = jax.nn.silu(h)
        h = _tag(conv3d(self.out_channels, 3, self.dtype, c_in * 27,
                        name="conv1", impl=ci)(h))
        h = GroupNorm3D(name="norm2", fused_swish=fs)(h)
        if not fs:
            h = jax.nn.silu(h)
        h = _tag(conv3d(
            self.out_channels, 3, self.dtype, self.out_channels * 27,
            name="conv2", impl=ci,
        )(h))
        if c_in != self.out_channels:
            x = _tag(
                conv3d(self.out_channels, 1, self.dtype, c_in, name="nin_shortcut")(x)
            )
        return x + h


class AttnBlock3D(nn.Module):
    """Self-attention over flattened (t·h·w) tokens, fixed 8 heads
    (reference tae.py:13-54).

    Long-video scale-out: with ``mesh``/``ring_axis`` set (and that axis
    wider than 1), the T dim is treated as sharded over the axis and the
    attention runs as exact ring attention (ops/ring_attention.py) — k/v
    blocks rotate over ICI, no chip ever holds the full (t·h·w)² score
    matrix. Numerically identical to the dense path (tests/test_ops.py,
    tests/test_models.py::test_tvae_ring_attention_matches_dense).
    """

    dtype: Dtype = jnp.float32
    num_heads: int = 8
    mesh: Any = None
    ring_axis: str | None = None
    attn_chunk: int = 0
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, t, h, w, c = x.shape
        head_dim = c // self.num_heads
        hn = GroupNorm3D(name="norm")(x)
        qkv = nn.Conv(
            3 * c,
            (1, 1, 1),
            use_bias=False,
            kernel_init=torch_conv_kernel_init,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="qkv",
        )(hn)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        ring = (
            self.ring_axis is not None
            and self.mesh is not None
            and self.mesh.shape.get(self.ring_axis, 1) > 1
        )
        if ring:
            from jax.sharding import PartitionSpec as P

            from vqgan_tpu.ops.ring_attention import ring_attention

            # shard batch over the data-like axes too when divisible, so the
            # ring path composes with data parallelism without resharding
            data_axes = tuple(
                a for a in ("data", "fsdp")
                if self.mesh.shape.get(a, 1) > 1
            )
            n_data = 1
            for a in data_axes:
                n_data *= self.mesh.shape[a]
            bspec = data_axes if (data_axes and b % n_data == 0) else None
            spec = P(bspec, self.ring_axis, None, None, None)
            nh, hd, ax = self.num_heads, head_dim, self.ring_axis

            def local_attn(ql, kl, vl):
                bb, tl, hh, ww, cc = ql.shape

                def r(z):
                    return z.reshape(bb, tl * hh * ww, nh, hd)

                o = ring_attention(r(ql), r(kl), r(vl), ax)
                return o.reshape(bb, tl, hh, ww, cc)

            out = jax.shard_map(
                local_attn,
                mesh=self.mesh,
                in_specs=(spec,) * 3,
                out_specs=spec,
            )(q, k, v)
        else:

            def heads(z):
                return z.reshape(b, t * h * w, self.num_heads, head_dim)

            n_tok = t * h * w
            if self.attn_chunk and n_tok > self.attn_chunk:
                if n_tok % self.attn_chunk:
                    # falling back to dense would reintroduce the O(N²)
                    # score matrix the flag exists to avoid — on a long clip
                    # that is a 20-min compile then an opaque HBM OOM, so
                    # fail with the fix instead
                    raise ValueError(
                        f"attn_chunk {self.attn_chunk} must divide the "
                        f"mid-block token count {n_tok} (= T·H·W after "
                        f"downsampling); pick a divisor of {n_tok}"
                    )
                # exact memory-efficient attention: long clips whose dense
                # score matrix would not fit one chip's HBM. On TPU this is
                # the Pallas flash kernel (VMEM-resident score tiles); the
                # lax chunk scan is the portable fallback (CPU, export).
                from vqgan_tpu.ops.flash_attention import (
                    memory_efficient_attention,
                )

                out = memory_efficient_attention(
                    heads(q), heads(k), heads(v), self.attn_chunk,
                    impl=self.attn_impl,
                )
            else:
                out = jax.nn.dot_product_attention(heads(q), heads(k), heads(v))
            out = out.reshape(b, t, h, w, c)
        out = nn.Conv(
            c,
            (1, 1, 1),
            use_bias=False,
            kernel_init=nn.initializers.normal(stddev=0.2 / (c ** 0.5)),
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="proj_out",
        )(out)
        return x + out


class Downsample3D(nn.Module):
    """Stride-2 conv with (0,1) pad over T, H, W (reference tae.py:93-104)."""

    dtype: Dtype = jnp.float32
    conv3d_impl: str = "direct"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 1), (0, 0)))
        return _tag(conv3d(
            c, 3, self.dtype, c * 27, strides=2, padding="VALID", name="conv",
            impl=self.conv3d_impl,
        )(x))


class SubpixelUpConv3D(nn.Module):
    """Parameter-compatible fused nearest-2x-3D + 3x3x3 conv: identical
    ``kernel``/``bias`` tensors to the Conv3d it replaces, computed as 8
    subpixel phase convs in one wide 2x2x2 conv (ops/subpixel.py) — the 8x
    upsampled activation is never written to HBM and the conv does 8 MACs
    per output voxel instead of 27."""

    features: int
    dtype: Dtype
    fan_in: int
    variant: str = "subpixel"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from vqgan_tpu.ops.subpixel import (
            upsample2x_conv3d,
            upsample2x_conv3d_dilated,
        )

        kernel = self.param(
            "kernel", torch_conv_kernel_init,
            (3, 3, 3, x.shape[-1], self.features), jnp.float32,
        )
        bias = self.param(
            "bias", _torch_bias_init(self.fan_in), (self.features,),
            jnp.float32,
        )
        fn = (
            upsample2x_conv3d_dilated
            if self.variant == "dilated"
            else upsample2x_conv3d
        )
        out = fn(x.astype(self.dtype), kernel.astype(self.dtype))
        return out + bias.astype(out.dtype)


class Upsample3D(nn.Module):
    dtype: Dtype = jnp.float32
    conv3d_impl: str = "direct"
    upsample_impl: str = "direct"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        impl = self.upsample_impl
        if impl == "auto":
            impl = "dilated" if jax.default_backend() == "tpu" else "direct"
        if impl in ("fused", "dilated"):
            variant = "dilated" if impl == "dilated" else "subpixel"
            return _tag(SubpixelUpConv3D(
                c, self.dtype, c * 27, variant=variant, name="conv")(x))
        x = nearest_upsample_2x_3d(x)
        return _tag(conv3d(c, 3, self.dtype, c * 27, name="conv",
                           impl=self.conv3d_impl)(x))


class DownLevel3D(nn.Module):
    block_out: int
    num_res_blocks: int
    has_downsample: bool
    dtype: Dtype
    remat: bool = False
    remat_policy: str = "full"
    fused_swish: bool = True
    conv3d_impl: str = "direct"

    @nn.compact
    def __call__(self, h):
        Block = _remat(ResnetBlock3D, self.remat_policy) if self.remat else ResnetBlock3D
        for i in range(self.num_res_blocks):
            h = Block(self.block_out, dtype=self.dtype,
                      fused_swish=self.fused_swish,
                      conv3d_impl=self.conv3d_impl, name=f"block_{i}")(h)
        if self.has_downsample:
            h = Downsample3D(dtype=self.dtype, conv3d_impl=self.conv3d_impl,
                             name="downsample")(h)
        return h


class UpLevel3D(nn.Module):
    block_out: int
    num_res_blocks: int
    has_upsample: bool
    dtype: Dtype
    remat: bool = False
    remat_policy: str = "full"
    fused_swish: bool = True
    conv3d_impl: str = "direct"
    upsample_impl: str = "direct"

    @nn.compact
    def __call__(self, h):
        Block = _remat(ResnetBlock3D, self.remat_policy) if self.remat else ResnetBlock3D
        for i in range(self.num_res_blocks + 1):
            h = Block(self.block_out, dtype=self.dtype,
                      fused_swish=self.fused_swish,
                      conv3d_impl=self.conv3d_impl, name=f"block_{i}")(h)
        if self.has_upsample:
            h = Upsample3D(dtype=self.dtype, conv3d_impl=self.conv3d_impl,
                           upsample_impl=self.upsample_impl,
                           name="upsample")(h)
        return h


class Encoder3D(nn.Module):
    """Reference tae.py:120-184; conv_out emits 2·z_channels when double_z."""

    ch: int
    ch_mult: Tuple[int, ...]
    num_res_blocks: int
    z_channels: int
    double_z: bool = True
    dtype: Dtype = jnp.float32
    mesh: Any = None
    ring_axis: str | None = None
    remat: bool = False
    remat_policy: str = "full"
    attn_chunk: int = 0
    attn_impl: str = "auto"
    fused_swish: bool = True
    conv3d_impl: str = "direct"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        n = len(self.ch_mult)
        Level = _remat(DownLevel3D, self.remat_policy) if self.remat else DownLevel3D
        h = conv3d(self.ch, 3, self.dtype, x.shape[-1] * 27, name="conv_in",
                   impl=self.conv3d_impl)(x)
        for i in range(n):
            h = Level(
                block_out=self.ch * self.ch_mult[i],
                num_res_blocks=self.num_res_blocks,
                has_downsample=i != n - 1,
                dtype=self.dtype,
                remat=self.remat,
                remat_policy=self.remat_policy,
                fused_swish=self.fused_swish,
                conv3d_impl=self.conv3d_impl,
                name=f"down_{i}",
            )(h)
        block_in = self.ch * self.ch_mult[-1]
        # mid blocks remat too (2D-family parity, ae.py:137-143) — they are
        # the widest-channel activations at the attention resolution
        Mid = _remat(ResnetBlock3D, self.remat_policy) if self.remat else ResnetBlock3D
        fs = self.fused_swish
        h = Mid(block_in, dtype=self.dtype, fused_swish=fs,
                conv3d_impl=self.conv3d_impl,
                name="mid_block_1")(h)
        h = AttnBlock3D(dtype=self.dtype, mesh=self.mesh,
                        ring_axis=self.ring_axis,
                        attn_chunk=self.attn_chunk,
                        attn_impl=self.attn_impl, name="mid_attn_1")(h)
        h = Mid(block_in, dtype=self.dtype, fused_swish=fs,
                conv3d_impl=self.conv3d_impl,
                name="mid_block_2")(h)
        h = GroupNorm3D(name="norm_out", fused_swish=fs)(h)
        if not fs:
            h = jax.nn.silu(h)
        out_ch = self.z_channels * (2 if self.double_z else 1)
        h = conv3d(out_ch, 3, self.dtype, block_in * 27, name="conv_out",
                   impl=self.conv3d_impl)(h)
        return h


class Decoder3D(nn.Module):
    """Reference tae.py:187-250."""

    ch: int
    out_ch: int
    ch_mult: Tuple[int, ...]
    num_res_blocks: int
    dtype: Dtype = jnp.float32
    mesh: Any = None
    ring_axis: str | None = None
    remat: bool = False
    remat_policy: str = "full"
    attn_chunk: int = 0
    attn_impl: str = "auto"
    fused_swish: bool = True
    conv3d_impl: str = "direct"
    upsample_impl: str = "direct"

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        n = len(self.ch_mult)
        Level = _remat(UpLevel3D, self.remat_policy) if self.remat else UpLevel3D
        Mid = _remat(ResnetBlock3D, self.remat_policy) if self.remat else ResnetBlock3D
        fs = self.fused_swish
        block_in = self.ch * self.ch_mult[-1]
        h = conv3d(block_in, 3, self.dtype, z.shape[-1] * 27, name="conv_in",
                   impl=self.conv3d_impl)(z)
        h = Mid(block_in, dtype=self.dtype, fused_swish=fs,
                conv3d_impl=self.conv3d_impl,
                name="mid_block_1")(h)
        h = AttnBlock3D(dtype=self.dtype, mesh=self.mesh,
                        ring_axis=self.ring_axis,
                        attn_chunk=self.attn_chunk,
                        attn_impl=self.attn_impl, name="mid_attn_1")(h)
        h = Mid(block_in, dtype=self.dtype, fused_swish=fs,
                conv3d_impl=self.conv3d_impl,
                name="mid_block_2")(h)
        for i in reversed(range(n)):
            h = Level(
                block_out=self.ch * self.ch_mult[i],
                num_res_blocks=self.num_res_blocks,
                has_upsample=i != 0,
                dtype=self.dtype,
                remat=self.remat,
                remat_policy=self.remat_policy,
                fused_swish=self.fused_swish,
                conv3d_impl=self.conv3d_impl,
                upsample_impl=self.upsample_impl,
                name=f"up_{i}",
            )(h)
        h = GroupNorm3D(name="norm_out", fused_swish=fs)(h)
        if not fs:
            h = jax.nn.silu(h)
        h = conv3d(self.out_ch, 3, self.dtype, h.shape[-1] * 27,
                   name="conv_out", impl=self.conv3d_impl)(h)
        return h


class TVAE(nn.Module):
    """Encoder + real DiagonalGaussian (or VQ) + decoder
    (reference tae.py:269-297). ``__call__`` returns (decoded, z).

    ``mesh`` + ``ring_axis``: run the mid-block attentions as exact ring
    attention with the video's T dim sharded over that mesh axis (long-clip
    sequence parallelism; convs are partitioned by GSPMD from the batch
    sharding, attention by ops/ring_attention.py). Parameter trees are
    identical with or without it — checkpoints interchange freely.
    """

    cfg: TVAEConfig
    mesh: Any = None
    ring_axis: str | None = None

    def setup(self):
        dtype = DTYPES[self.cfg.compute_dtype]
        double_z = self.cfg.reg_type == "gaussian"
        conv_impl = self.cfg.conv3d_impl
        if conv_impl == "auto" and self.ring_axis is not None:
            # context-parallel runs shard the clip's T dim; tap2d's (B·T)
            # flatten would merge a sharded dim into batch and force GSPMD
            # resharding around every conv — keep the direct Conv3d there
            conv_impl = "direct"
        self.encoder = Encoder3D(
            ch=self.cfg.ch,
            ch_mult=tuple(self.cfg.ch_mult),
            num_res_blocks=self.cfg.num_res_blocks,
            z_channels=self.cfg.z_channels,
            double_z=double_z,
            dtype=dtype,
            mesh=self.mesh,
            ring_axis=self.ring_axis,
            remat=self.cfg.remat,
            remat_policy=self.cfg.remat_policy,
            conv3d_impl=conv_impl,
            attn_chunk=self.cfg.attn_chunk,
            attn_impl=self.cfg.attn_impl,
            fused_swish=self.cfg.fused_gn_swish,
        )
        self.decoder = Decoder3D(
            ch=self.cfg.ch,
            out_ch=self.cfg.out_ch,
            ch_mult=tuple(self.cfg.ch_mult),
            num_res_blocks=self.cfg.num_res_blocks,
            dtype=dtype,
            mesh=self.mesh,
            ring_axis=self.ring_axis,
            remat=self.cfg.remat,
            remat_policy=self.cfg.remat_policy,
            conv3d_impl=conv_impl,
            upsample_impl=self.cfg.upsample_impl,
            attn_chunk=self.cfg.attn_chunk,
            attn_impl=self.cfg.attn_impl,
            fused_swish=self.cfg.fused_gn_swish,
        )
        if self.cfg.reg_type == "gaussian":
            self.reg = DiagonalGaussian()
        elif self.cfg.reg_type == "vq":
            self.reg = VectorQuantizer(
                codebook_size=self.cfg.vq_codebook_size,
                embedding_dim=self.cfg.z_channels,
                beta=self.cfg.vq_beta,
                ema_decay=self.cfg.vq_ema_decay,
            )
        else:
            raise ValueError(self.cfg.reg_type)

    def encode(self, x):
        return self.encoder(x)

    def decode(self, z):
        return self.decoder(z)

    def regularize(self, z: jax.Array, update_stats: bool = False):
        """Returns z_s for gaussian; (z_q, vq_aux) for VQ — the same surface
        as VAE.regularize (models/ae.py) so train/step3d.py can share the 2D
        step's EMA-codebook machinery. ``update_stats`` (VQ only) controls
        the EMA statistic writes — pass True in the train step (with the
        "vq_ema" collection mutable), False for eval applies."""
        if isinstance(self.reg, VectorQuantizer):
            return self.reg(z, update_stats)
        return self.reg(z)

    def deterministic_latent(self, z):
        """Deterministic serving/eval latent from the encoder output: the
        posterior mean for the gaussian regularizer, the quantized embedding
        for vq. One definition shared by eval (trainer3d) and serving export
        so the three latent consumers cannot drift."""
        if self.cfg.reg_type == "gaussian":
            mean, _ = jnp.split(z.astype(jnp.float32), 2, axis=-1)
            return mean.astype(z.dtype)
        out = self.regularize(z, update_stats=False)
        return out[0] if isinstance(out, tuple) else out

    def __call__(self, x: jax.Array):
        z = self.encoder(x)
        z_s = self.regularize(z, update_stats=False)
        if isinstance(z_s, tuple):
            z_s = z_s[0]
        dec = self.decoder(z_s)
        return dec, z
