"""Reconstruction / latent regularization losses (reference
vae_trainer.py:179-217).

The reference's ``vae_loss_function`` computes an optional recon term (pooled
L1 at 1/16 area scale, or blurriness-heatmap-masked L1) and an L2 latent
penalty, then returns ``recon·0.0 + 0.1·mean(z²)`` — the recon term is
compiled out. We keep the structure but expose the weights
(TrainConfig.recon_weight defaults to 0.0, z_reg_weight to 0.1) and skip the
recon computation entirely when its weight is 0 (XLA would DCE it anyway; we
avoid tracing it).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from vqgan_tpu.ops.heatmap import blurriness_heatmap
from vqgan_tpu.ops.resize import area_downsample


def vae_loss_function(
    x: jax.Array,
    x_reconstructed: jax.Array,
    z: jax.Array,
    do_pool: bool = True,
    recon_weight: float = 0.0,
    z_reg_weight: float = 0.1,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """x, x_reconstructed: (B,H,W,3); z: (B,h,w,C). Returns (loss, metrics
    matching the reference's keys, vae_trainer.py:210-217)."""
    zf = z.astype(jnp.float32)
    elewise = jnp.square(zf)
    zloss = elewise.mean()

    if recon_weight != 0.0:
        xr = x_reconstructed.astype(jnp.float32)
        xt = x.astype(jnp.float32)
        if do_pool:
            # area-downsample ×1/16 then L1 (vae_trainer.py:183-187)
            recon = jnp.abs(area_downsample(xr, 16) - area_downsample(xt, 16)).mean()
        else:
            # blurriness-masked L1 (vae_trainer.py:189-196)
            mask = blurriness_heatmap(xt)
            recon = jnp.abs((xr - xt) * mask).mean()
    else:
        recon = jnp.zeros((), jnp.float32)

    loss = recon * recon_weight + zloss * z_reg_weight
    metrics = {
        "recon_loss": recon,
        "kl_loss": zloss,
        "average_of_abs_z": jnp.abs(zf).mean(),
        "std_of_abs_z": jnp.abs(zf).std(),
        "average_of_logvar": jnp.zeros(()),
        "std_of_logvar": jnp.zeros(()),
    }
    return loss, metrics
