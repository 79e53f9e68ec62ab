"""2D image VAE (FLUX-derived) — encoder, decoder, latent regularizers.

Behavioral rebuild of reference ae.py:170-392 in NHWC flax.linen:
  - Encoder: conv_in → per-level ResnetBlocks + Downsample (skipped at the
    last level; also at level 0 in wavelet mode) → mid(res, attn?, res) →
    GroupNorm → swish → conv_out (ae.py:239-257),
  - wavelet mode: DWT front-end, conv_in 4·in_ch → 2·ch, ch_mult[0] doubled,
    in_ch_mult starts at 2 (ae.py:188-203),
  - Decoder: conv_in ← z → mid → reversed levels of (num_res_blocks+1)
    ResnetBlocks + Upsample (skipped at level 0) → norm → swish → conv_out
    (ae.py:318-333); HR decode appends a ch_mult level (ae.py:381),
  - regularizers: the reference's degenerate constant-variance Gaussian
    (ae.py:336-348), a real reparameterized Gaussian (tae.py:253-266), and a
    VQ codebook (declared capability, models/quant.py).

Module names are chosen so the PyTorch-checkpoint importer
(train/torch_import.py) can map reference state_dict keys mechanically:
torch ``encoder.down.0.block.1.conv1.weight`` ↔ params
``encoder/down_0/block_1/conv1/kernel``.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vqgan_tpu.config import DTYPES, VAEConfig
from vqgan_tpu.models.blocks import (
    AttnBlock,
    Downsample,
    FP32GroupNorm,
    ResnetBlock,
    Upsample,
    conv3x3,
    swish,
)
from vqgan_tpu.models.blocks import remat_with_policy
from vqgan_tpu.models.quant import VectorQuantizer
from vqgan_tpu.ops.wavelet import wavelet_transform_multi_channel

Dtype = Any


class DownLevel(nn.Module):
    block_out: int
    num_res_blocks: int
    has_downsample: bool
    dtype: Dtype
    remat: bool = False
    remat_policy: str = "full"
    pallas_gn: bool = False

    @nn.compact
    def __call__(self, h: jax.Array) -> jax.Array:
        Block = remat_with_policy(ResnetBlock, self.remat_policy, "vae_conv") if self.remat else ResnetBlock
        for i in range(self.num_res_blocks):
            h = Block(
                self.block_out, dtype=self.dtype, pallas_gn=self.pallas_gn,
                name=f"block_{i}",
            )(h)
        if self.has_downsample:
            h = Downsample(dtype=self.dtype, name="downsample")(h)
        return h


class UpLevel(nn.Module):
    block_out: int
    num_res_blocks: int
    has_upsample: bool
    dtype: Dtype
    remat: bool = False
    remat_policy: str = "full"
    pallas_gn: bool = False
    upsample_impl: str = "direct"

    @nn.compact
    def __call__(self, h: jax.Array) -> jax.Array:
        Block = remat_with_policy(ResnetBlock, self.remat_policy, "vae_conv") if self.remat else ResnetBlock
        for i in range(self.num_res_blocks + 1):
            h = Block(
                self.block_out, dtype=self.dtype, pallas_gn=self.pallas_gn,
                name=f"block_{i}",
            )(h)
        if self.has_upsample:
            h = Upsample(dtype=self.dtype, impl=self.upsample_impl,
                         name="upsample")(h)
        return h


class Encoder(nn.Module):
    """Reference ae.py:170-257. Emits z_channels (or 2·z_channels for the
    real-Gaussian regularizer, as in tae.py:165-167)."""

    ch: int
    ch_mult: Tuple[int, ...]
    num_res_blocks: int
    z_channels: int
    use_attn: bool = False
    use_wavelet: bool = False
    double_z: bool = False
    dtype: Dtype = jnp.float32
    remat: bool = False
    remat_policy: str = "full"
    pallas_gn: bool = False
    attn_chunk: int = 0
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        num_resolutions = len(self.ch_mult)
        # wavelet mode doubles conv_in width and level-0 multiplier
        # (reference ae.py:188-203)
        ch_mult = list(self.ch_mult)
        if self.use_wavelet:
            x = wavelet_transform_multi_channel(x)
            ch_mult[0] *= 2
            h = conv3x3(self.ch * 2, self.dtype, name="conv_in")(x)
        else:
            h = conv3x3(self.ch, self.dtype, name="conv_in")(x)

        # remat at LEVEL granularity: only level-boundary activations are
        # saved; everything within a level is recomputed in the backward —
        # the decisive memory lever for 512px configs on a 16GB chip
        Level = remat_with_policy(DownLevel, self.remat_policy, "vae_conv") if self.remat else DownLevel
        for i_level in range(num_resolutions):
            has_down = i_level != num_resolutions - 1 and not (
                self.use_wavelet and i_level == 0
            )
            h = Level(
                block_out=self.ch * ch_mult[i_level],
                num_res_blocks=self.num_res_blocks,
                has_downsample=has_down,
                dtype=self.dtype,
                # nested: blocks also remat inside the rematted level, so the
                # level's backward-recompute keeps only block boundaries live
                remat=self.remat,
                remat_policy=self.remat_policy,
                pallas_gn=self.pallas_gn,
                name=f"down_{i_level}",
            )(h)

        block_in = self.ch * ch_mult[-1]
        Block = remat_with_policy(ResnetBlock, self.remat_policy, "vae_conv") if self.remat else ResnetBlock
        h = Block(block_in, dtype=self.dtype, pallas_gn=self.pallas_gn,
                  name="mid_block_1")(h)
        if self.use_attn:
            h = AttnBlock(dtype=self.dtype, attn_chunk=self.attn_chunk,
                          attn_impl=self.attn_impl, name="mid_attn_1")(h)
        h = Block(block_in, dtype=self.dtype, pallas_gn=self.pallas_gn,
                  name="mid_block_2")(h)
        h = FP32GroupNorm(
            name="norm_out", fused_swish=True, use_pallas=self.pallas_gn
        )(h)
        out_ch = self.z_channels * (2 if self.double_z else 1)
        h = conv3x3(out_ch, self.dtype, name="conv_out")(h)
        return h


class Decoder(nn.Module):
    """Reference ae.py:260-333."""

    ch: int
    out_ch: int
    ch_mult: Tuple[int, ...]
    num_res_blocks: int
    use_attn: bool = False
    dtype: Dtype = jnp.float32
    remat: bool = False
    remat_policy: str = "full"
    pallas_gn: bool = False
    attn_chunk: int = 0
    attn_impl: str = "auto"
    upsample_impl: str = "direct"

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        num_resolutions = len(self.ch_mult)
        block_in = self.ch * self.ch_mult[-1]
        h = conv3x3(block_in, self.dtype, name="conv_in")(z)
        Block = remat_with_policy(ResnetBlock, self.remat_policy, "vae_conv") if self.remat else ResnetBlock
        h = Block(block_in, dtype=self.dtype, pallas_gn=self.pallas_gn,
                  name="mid_block_1")(h)
        if self.use_attn:
            h = AttnBlock(dtype=self.dtype, attn_chunk=self.attn_chunk,
                          attn_impl=self.attn_impl, name="mid_attn_1")(h)
        h = Block(block_in, dtype=self.dtype, pallas_gn=self.pallas_gn,
                  name="mid_block_2")(h)
        Level = remat_with_policy(UpLevel, self.remat_policy, "vae_conv") if self.remat else UpLevel
        for i_level in reversed(range(num_resolutions)):
            h = Level(
                block_out=self.ch * self.ch_mult[i_level],
                num_res_blocks=self.num_res_blocks,
                has_upsample=i_level != 0,
                dtype=self.dtype,
                remat=self.remat,
                remat_policy=self.remat_policy,
                pallas_gn=self.pallas_gn,
                upsample_impl=self.upsample_impl,
                name=f"up_{i_level}",
            )(h)
        h = FP32GroupNorm(
            name="norm_out", fused_swish=True, use_pallas=self.pallas_gn
        )(h)
        h = conv3x3(self.out_ch, self.dtype, name="conv_out")(h)
        return h


class IdentityGaussian(nn.Module):
    """The reference's degenerate constant-variance regularizer: z is the
    mean, std=0.0 → deterministic identity (ae.py:336-348; README.md:56)."""

    def __call__(self, z: jax.Array) -> jax.Array:
        return z


class DiagonalGaussian(nn.Module):
    """Real reparameterized Gaussian over a 2·z_channels input
    (reference tae.py:253-266): chunk → clamp logvar ≥ -3 → mean + std·ε."""

    sample: bool = True

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        mean, logvar = jnp.split(z, 2, axis=-1)
        if not self.sample:
            return mean
        logvar = jnp.clip(logvar, min=-3.0)
        std = jnp.exp(0.5 * logvar)
        eps = jax.random.normal(self.make_rng("sample"), mean.shape, mean.dtype)
        return mean + std * eps


class VAE(nn.Module):
    """Encoder + regularizer + decoder (reference ae.py:351-392).

    ``__call__`` returns ``(decoded, z)`` like the reference. ``encode`` /
    ``decode`` / ``regularize`` are exposed as apply-methods because the
    training loop drives them separately (vae_trainer.py:538,563,624).
    """

    cfg: VAEConfig

    def setup(self):
        enc_dtype = DTYPES[self.cfg.enc_dtype]
        dec_dtype = DTYPES[self.cfg.dec_dtype]
        double_z = self.cfg.reg_type == "gaussian"
        self.encoder = Encoder(
            ch=self.cfg.ch,
            ch_mult=tuple(self.cfg.ch_mult),
            num_res_blocks=self.cfg.num_res_blocks,
            z_channels=self.cfg.z_channels,
            use_attn=self.cfg.use_attn,
            use_wavelet=self.cfg.use_wavelet,
            double_z=double_z,
            dtype=enc_dtype,
            remat=self.cfg.remat,
            remat_policy=self.cfg.remat_policy,
            pallas_gn=self.cfg.use_pallas_gn,
            attn_chunk=self.cfg.attn_chunk,
            attn_impl=self.cfg.attn_impl,
        )
        self.decoder = Decoder(
            ch=self.cfg.ch,
            out_ch=self.cfg.out_ch,
            ch_mult=tuple(self.cfg.decoder_ch_mult),
            num_res_blocks=self.cfg.num_res_blocks,
            use_attn=self.cfg.use_attn,
            dtype=dec_dtype,
            remat=self.cfg.remat,
            remat_policy=self.cfg.remat_policy,
            pallas_gn=self.cfg.use_pallas_gn,
            attn_chunk=self.cfg.attn_chunk,
            attn_impl=self.cfg.attn_impl,
            upsample_impl=self.cfg.upsample_impl,
        )
        if self.cfg.reg_type == "identity_gaussian":
            self.reg = IdentityGaussian()
        elif self.cfg.reg_type == "gaussian":
            self.reg = DiagonalGaussian()
        elif self.cfg.reg_type == "vq":
            self.reg = VectorQuantizer(
                codebook_size=self.cfg.vq_codebook_size,
                embedding_dim=self.cfg.z_channels,
                beta=self.cfg.vq_beta,
                ema_decay=self.cfg.vq_ema_decay,
            )
        else:
            raise ValueError(f"unknown reg_type {self.cfg.reg_type}")

    def encode(self, x: jax.Array) -> jax.Array:
        return self.encoder(x)

    def decode(self, z: jax.Array) -> jax.Array:
        return self.decoder(z)

    def regularize(self, z: jax.Array, update_stats: bool = False):
        """Returns z_s for identity/gaussian; (z_q, vq_aux) for VQ.
        ``update_stats`` (VQ only) controls EMA statistic writes — pass True
        in the train step (with the "vq_ema" collection mutable), False for
        eval applies."""
        if isinstance(self.reg, VectorQuantizer):
            return self.reg(z, update_stats)
        return self.reg(z)

    def __call__(self, x: jax.Array):
        z = self.encoder(x)
        if isinstance(self.reg, VectorQuantizer):
            z_s, _ = self.reg(z, update_stats=False)
        else:
            z_s = self.reg(z)
        dec = self.decoder(z_s)
        return dec, z


def build_vae(cfg: VAEConfig) -> VAE:
    return VAE(cfg=cfg)


def init_vae_params(cfg: VAEConfig, rng: jax.Array, batch: int = 1):
    """Initialize VAE parameters with the parity init scheme."""
    model = VAE(cfg=cfg)
    x = jnp.zeros((batch, cfg.resolution, cfg.resolution, cfg.in_channels))
    rngs = {"params": rng, "sample": jax.random.fold_in(rng, 1)}
    variables = model.init(rngs, x)
    return model, variables["params"]
