"""2D model blocks (NHWC, flax.linen) — the FLUX-style VAE building blocks.

Rebuilt TPU-first from the behavior of reference ae.py:13-167:
  - NHWC activations / HWIO kernels (the TPU-native conv layout; torch's NCHW
    would force transposes around every XLA conv),
  - fp32 GroupNorm reductions under bf16 compute (ae.py:41-53),
  - init parity with the reference: torch-default kaiming-uniform conv
    kernels, all conv/GroupNorm biases zero (ae.py:233-237, 312-316),
    near-zero ResnetBlock.conv2 (std=1e-4/out_ch, ae.py:120-121), attention
    proj_out std=0.2/sqrt(c) (ae.py:72).

Attention runs over the flattened bottleneck tokens (≤ ~1k tokens at training
resolutions) via jax.nn.dot_product_attention, which XLA fuses; sequence
lengths here are too small for a custom flash kernel to pay off.
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from vqgan_tpu.ops.normalization import group_norm_fp32
from vqgan_tpu.ops.resize import nearest_upsample_2x

Dtype = Any

# torch Conv2d default init: kaiming_uniform(a=√5) == U(±1/√fan_in), i.e.
# variance (1/3)/fan_in — expressed as a JAX variance_scaling initializer so
# fresh JAX training matches the reference's init statistics.
torch_conv_kernel_init = nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform"
)


def swish(x: jax.Array) -> jax.Array:
    return jax.nn.silu(x)  # x * sigmoid(x), reference ae.py:13-14


def remat_with_policy(cls, policy: str, tag: str):
    """nn.remat with a residual policy (shared by the 2D and 3D families).

    "full": save nothing inside the region — memory-minimal, recompute
    everything. "conv": save only the ``tag_saveable``-tagged conv outputs
    and recompute the cheap elementwise chains (norm/silu/add) — measured a
    net THROUGHPUT win on HBM-bound steps, where the default schedule's
    extra residual writes cost more than the recompute (BASELINE.md,
    "selective remat")."""
    if policy == "conv":
        return nn.remat(
            cls, policy=jax.checkpoint_policies.save_only_these_names(tag)
        )
    if policy == "full":
        return nn.remat(cls)
    raise ValueError(f"unknown remat_policy {policy!r}")


def tag_saveable(x: jax.Array, tag: str) -> jax.Array:
    """Mark a value as saveable under the "conv" remat policy. Erased during
    lowering — free when no policy references the tag."""
    from jax.ad_checkpoint import checkpoint_name

    return checkpoint_name(x, tag)


class FP32GroupNorm(nn.Module):
    """GroupNorm(32, eps=1e-6) computed in fp32 (reference ae.py:41-53).

    ``fused_swish``: apply the following swish inside the op. With
    ``use_pallas`` the fused Pallas kernel (ops/pallas/groupnorm.py) runs on
    TPU — one-read statistics + one fused normalize·swish sweep.
    """

    num_groups: int = 32
    eps: float = 1e-6
    fused_swish: bool = False
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        if self.use_pallas:
            from vqgan_tpu.ops.pallas.groupnorm import group_norm_swish_auto

            return group_norm_swish_auto(
                x, scale, bias, self.num_groups, self.eps,
                with_swish=self.fused_swish,
            )
        return group_norm_fp32(
            x, scale, bias, self.num_groups, self.eps,
            with_swish=self.fused_swish,
        )


def conv3x3(features: int, dtype: Dtype, name: str | None = None, **kw) -> nn.Conv:
    return nn.Conv(
        features,
        (3, 3),
        padding="SAME",
        kernel_init=torch_conv_kernel_init,
        bias_init=nn.initializers.zeros,  # encoder/decoder zero all conv biases
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
        **kw,
    )


def conv1x1(features: int, dtype: Dtype, name: str | None = None, **kw) -> nn.Conv:
    return nn.Conv(
        features,
        (1, 1),
        kernel_init=torch_conv_kernel_init,
        bias_init=nn.initializers.zeros,
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
        **kw,
    )


class ResnetBlock(nn.Module):
    """norm→swish→conv ×2 with ~identity start (reference ae.py:96-140)."""

    out_channels: int
    dtype: Dtype = jnp.float32
    pallas_gn: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_channels = x.shape[-1]
        h = FP32GroupNorm(
            name="norm1", fused_swish=True, use_pallas=self.pallas_gn
        )(x)
        h = tag_saveable(
            conv3x3(self.out_channels, self.dtype, name="conv1")(h), "vae_conv"
        )
        h = FP32GroupNorm(
            name="norm2", fused_swish=True, use_pallas=self.pallas_gn
        )(h)
        # conv2 init near-zero so residual branches start ≈ identity
        # (reference ae.py:120-121: normal std=1e-4/out_ch, zero bias)
        h = nn.Conv(
            self.out_channels,
            (3, 3),
            padding="SAME",
            kernel_init=nn.initializers.normal(stddev=1e-4 / self.out_channels),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv2",
        )(h)
        h = tag_saveable(h, "vae_conv")
        if in_channels != self.out_channels:
            x = tag_saveable(
                conv1x1(self.out_channels, self.dtype, name="nin_shortcut")(x),
                "vae_conv",
            )
        return x + h


class AttnBlock(nn.Module):
    """Single-layer self-attention over flattened spatial tokens
    (reference ae.py:56-93): head_dim=64, qkv/proj as bias-free 1×1 convs,
    proj_out init std=0.2/sqrt(c), residual add.

    ``attn_chunk`` > 0: run memory-efficient attention (Pallas flash kernel
    on TPU, exact chunked lax scan elsewhere — ops/flash_attention.py) when
    the token count exceeds it, instead of dense SDPA whose (h·w)² score
    matrix is the memory wall at very high resolutions — the 2D counterpart
    of the TVAE's long-clip path (models/tae.py). 0 = always dense (the
    reference's behavior; mid-block token counts at ≤512px are tiny)."""

    dtype: Dtype = jnp.float32
    head_dim: int = 64
    attn_chunk: int = 0
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        num_heads = c // self.head_dim
        hn = FP32GroupNorm(name="norm")(x)
        qkv = nn.Conv(
            3 * c,
            (1, 1),
            use_bias=False,
            kernel_init=torch_conv_kernel_init,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="qkv",
        )(hn)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(b, h * w, num_heads, self.head_dim)

        n_tok = h * w
        if self.attn_chunk and n_tok > self.attn_chunk:
            if n_tok % self.attn_chunk:
                raise ValueError(
                    f"attn_chunk {self.attn_chunk} must divide the "
                    f"mid-block token count {n_tok} (= H·W after "
                    f"downsampling); pick a divisor of {n_tok}"
                )
            from vqgan_tpu.ops.flash_attention import (
                memory_efficient_attention,
            )

            out = memory_efficient_attention(
                heads(q), heads(k), heads(v), self.attn_chunk,
                impl=self.attn_impl,
            )
        else:
            out = jax.nn.dot_product_attention(heads(q), heads(k), heads(v))
        out = out.reshape(b, h, w, c)
        out = nn.Conv(
            c,
            (1, 1),
            use_bias=False,
            kernel_init=nn.initializers.normal(stddev=0.2 / math.sqrt(c)),
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="proj_out",
        )(out)
        return x + out


class Downsample(nn.Module):
    """Stride-2 3×3 conv with asymmetric (0,1) pad on H and W — the FLUX
    convention (reference ae.py:143-154); must match for checkpoint parity."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return tag_saveable(nn.Conv(
            c,
            (3, 3),
            strides=(2, 2),
            padding="VALID",
            kernel_init=torch_conv_kernel_init,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(x), "vae_conv")


class SubpixelUpConv(nn.Module):
    """Parameter-compatible fused form of nearest-2× + 3×3 conv: same
    ``kernel``/``bias`` tensors as the ``nn.Conv`` it replaces (checkpoint /
    torch-import parity), with two exact lowerings (ops/subpixel.py):
    ``variant="subpixel"`` — 4 phase convs in one wide 2×2 conv + interleave;
    ``variant="dilated"`` — one lhs-dilated conv (stride-2 transposed-conv
    form), output written directly with no interleave pass. Both do 4 MACs
    per output pixel instead of 9 and never materialize the 4× upsampled
    activation."""

    features: int
    dtype: Dtype = jnp.float32
    variant: str = "subpixel"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from vqgan_tpu.ops.subpixel import (
            upsample2x_conv2d,
            upsample2x_conv2d_dilated,
        )

        kernel = self.param(
            "kernel", torch_conv_kernel_init,
            (3, 3, x.shape[-1], self.features), jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        fn = (
            upsample2x_conv2d_dilated
            if self.variant == "dilated"
            else upsample2x_conv2d
        )
        out = fn(x.astype(self.dtype), kernel.astype(self.dtype))
        return out + bias.astype(out.dtype)


class Upsample(nn.Module):
    """Nearest 2× then 3×3 conv (reference ae.py:157-167). ``impl="fused"``
    computes the identical function as subpixel phase convs without writing
    the upsampled tensor; ``impl="dilated"`` as one lhs-dilated conv (the
    TPU-preferred lowering — measured fastest, BASELINE.md round 4);
    ``impl="auto"`` = dilated on TPU, direct elsewhere."""

    dtype: Dtype = jnp.float32
    impl: str = "direct"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        impl = self.impl
        if impl == "auto":
            impl = "dilated" if jax.default_backend() == "tpu" else "direct"
        if impl in ("fused", "dilated"):
            variant = "dilated" if impl == "dilated" else "subpixel"
            return tag_saveable(
                SubpixelUpConv(c, self.dtype, variant=variant, name="conv")(x),
                "vae_conv",
            )
        x = nearest_upsample_2x(x)
        return tag_saveable(conv3x3(c, self.dtype, name="conv")(x), "vae_conv")
