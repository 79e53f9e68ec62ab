from vqgan_tpu.losses.discriminator import PatchDiscriminator
from vqgan_tpu.losses.gan import (
    disc_accuracy,
    gan_disc_loss,
    generator_gan_loss,
    lecam_penalty,
    update_lecam_anchors,
)
from vqgan_tpu.losses.lpips import LPIPS
from vqgan_tpu.losses.recon import vae_loss_function

__all__ = [
    "PatchDiscriminator",
    "gan_disc_loss",
    "generator_gan_loss",
    "lecam_penalty",
    "update_lecam_anchors",
    "disc_accuracy",
    "LPIPS",
    "vae_loss_function",
]
