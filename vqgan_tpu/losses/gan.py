"""GAN objectives: BCE / hinge discriminator+generator losses, LeCam
regularization, and accuracy telemetry (reference vae_trainer.py:63-90,
517-522, 639-655, 684-693).

All functions are pure and jit-safe; under pjit global-batch semantics the
means are global (the reference's explicit all_reduce of logit means,
vae_trainer.py:636-637, becomes implicit).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax


def gan_disc_loss(
    real_preds: jax.Array, fake_preds: jax.Array, disc_type: str = "bce"
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Returns (0.5·(real_loss+fake_loss), metrics with avg logits + acc)
    — reference vae_trainer.py:63-90."""
    rp = real_preds.astype(jnp.float32)
    fp = fake_preds.astype(jnp.float32)
    if disc_type == "bce":
        real_loss = optax.sigmoid_binary_cross_entropy(rp, jnp.ones_like(rp)).mean()
        fake_loss = optax.sigmoid_binary_cross_entropy(fp, jnp.zeros_like(fp)).mean()
    elif disc_type == "hinge":
        real_loss = jax.nn.relu(1.0 - rp).mean()
        fake_loss = jax.nn.relu(1.0 + fp).mean()
    else:
        raise ValueError(f"unknown disc_type {disc_type}")
    metrics = {
        "avg_real_logits": rp.mean(),
        "avg_fake_logits": fp.mean(),
        "disc_acc": disc_accuracy(rp, fp),
    }
    return 0.5 * (real_loss + fake_loss), metrics


def disc_accuracy(real_preds: jax.Array, fake_preds: jax.Array) -> jax.Array:
    """(real>0 count + fake<0 count) / total (vae_trainer.py:76-77)."""
    correct = jnp.sum(real_preds > 0) + jnp.sum(fake_preds < 0)
    total = real_preds.size + fake_preds.size
    return correct.astype(jnp.float32) / total


def generator_gan_loss(fake_preds: jax.Array, disc_type: str = "bce") -> jax.Array:
    """BCE-vs-ones or −mean(fake) (reference vae_trainer.py:688-693)."""
    fp = fake_preds.astype(jnp.float32)
    if disc_type == "bce":
        return optax.sigmoid_binary_cross_entropy(fp, jnp.ones_like(fp)).mean()
    elif disc_type == "hinge":
        return -fp.mean()
    raise ValueError(f"unknown disc_type {disc_type}")


def update_lecam_anchors(
    anchor_real: jax.Array,
    anchor_fake: jax.Array,
    avg_real_logits: jax.Array,
    avg_fake_logits: jax.Array,
    beta: float = 0.9,
) -> Tuple[jax.Array, jax.Array]:
    """EMA (β=0.9) of cross-chip-averaged logits (vae_trainer.py:639-646)."""
    new_real = beta * anchor_real + (1.0 - beta) * avg_real_logits
    new_fake = beta * anchor_fake + (1.0 - beta) * avg_fake_logits
    return new_real, new_fake


def lecam_penalty(
    real_preds: jax.Array,
    fake_preds: jax.Array,
    anchor_real: jax.Array,
    anchor_fake: jax.Array,
) -> jax.Array:
    """(real − ema_fake)² + (fake − ema_real)² (vae_trainer.py:649-653)."""
    rp = real_preds.astype(jnp.float32)
    fp = fake_preds.astype(jnp.float32)
    return jnp.mean(jnp.square(rp - anchor_fake)) + jnp.mean(
        jnp.square(fp - anchor_real)
    )
