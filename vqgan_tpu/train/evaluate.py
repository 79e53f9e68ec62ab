"""Eval: reconstruction grids on held-out batches (reference
vae_trainer.py:805-901).

encode (at eval the reference runs the encoder under bf16 autocast, :821-822)
→ clamp → reg → optional double-flip equivariance check (flip z over both
spatial axes, negate the last 4 latent channels; decode; flip the output
back — an identity check for a Z₂×Z₂-equivariant latent, :837-855) → decode
→ unnormalize → tile a 4×2 grid of D² crops.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vqgan_tpu.config import TrainConfig, VAEConfig
from vqgan_tpu.ops.resize import resize_area


def make_eval_step(cfg: TrainConfig, vae_cfg: VAEConfig, vae_model):
    enc_res = vae_cfg.resolution
    if cfg.eval_bf16:
        # dtype parity with the reference's bf16-autocast eval
        # (vae_trainer.py:821,841): rebuild the module with bf16 compute for
        # both encoder and decoder (params unchanged; GroupNorm stays fp32)
        import dataclasses

        vae_model = type(vae_model)(
            cfg=dataclasses.replace(
                vae_cfg, enc_dtype="bfloat16", dec_dtype="bfloat16"
            )
        )

    @jax.jit
    def eval_step(
        g_params, vq_ema, batch: jax.Array
    ) -> Tuple[jax.Array, jax.Array]:
        variables = {"params": g_params}
        if vq_ema is not None:
            variables["vq_ema"] = vq_ema
        if batch.dtype == jnp.uint8:  # loader device_normalize mode
            batch = batch.astype(jnp.float32) / 127.5 - 1.0
        x = resize_area(batch, (enc_res, enc_res))
        z = vae_model.apply(variables, x, method=vae_model.encode)
        if cfg.do_clamp:
            z = jnp.clip(z, -cfg.clamp_th, cfg.clamp_th)
        z_s = vae_model.apply(
            variables, z,
            method=vae_model.regularize,
            rngs={"sample": jax.random.PRNGKey(0)},
        )
        if isinstance(z_s, tuple):
            z_s = z_s[0]
        if cfg.flip_invariance:
            # flip both axes + negate last 4 channels (vae_trainer.py:837-839)
            c = z_s.shape[-1]
            sign = jnp.where(jnp.arange(c) >= c - 4, -1.0, 1.0).astype(z_s.dtype)
            z_s = jnp.flip(z_s, axis=(1, 2)) * sign
        recon = vae_model.apply(
            {"params": g_params}, z_s, method=vae_model.decode
        ).astype(jnp.float32)
        target = batch.astype(jnp.float32)
        # unnormalize + clamp (vae_trainer.py:845-849)
        recon = jnp.clip(recon * 0.5 + 0.5, 0.0, 1.0)
        target = jnp.clip(target * 0.5 + 0.5, 0.0, 1.0)
        if cfg.flip_invariance:
            # flip the output back (vae_trainer.py:852-855)
            recon = jnp.flip(recon, axis=(1, 2))
        return recon, target

    return eval_step


def tile_grid(images: np.ndarray, rows: int = 2, cols: int = 4, d: int = 256):
    """Tile the first rows*cols images' top-left D² crops into one image
    (vae_trainer.py:869-890)."""
    n = min(len(images), rows * cols)
    grid = np.zeros((rows * d, cols * d, 3), np.float32)
    for idx in range(n):
        i, j = divmod(idx, cols)
        img = images[idx]
        crop = img[:d, :d]
        ph, pw = crop.shape[:2]
        grid[i * d : i * d + ph, j * d : j * d + pw] = crop
    return grid
