"""Train state and optimizer construction.

The reference keeps G/D AdamW optimizers, a cosine-with-warmup schedule on G,
and LeCam EMA anchors as Python-side state (vae_trainer.py:455-490, 517-522).
Here the whole training state is one donated pytree that lives on device
across steps — params, both optimizer states, LeCam anchors, PRNG key, step —
so the hot loop never bounces state through the host.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from vqgan_tpu.config import TrainConfig


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    g_params: Any
    g_opt: Any
    d_params: Any  # None when GAN disabled
    d_opt: Any
    lecam_real: jax.Array
    lecam_fake: jax.Array
    rng: jax.Array
    vq_ema: Any = None  # EMA codebook statistics (reg_type=vq with EMA)
    # Polyak-averaged generator weights (cfg.ema_decay > 0); None when off.
    # Mirrors g_params' tree, so state_shardings gives it the param layout.
    g_ema: Any = None


def hf_cosine_schedule(base_lr: float, warmup_steps: int, total_steps: int):
    """Exactly HF transformers' get_cosine_schedule_with_warmup
    (vae_trainer.py:486-490): linear warmup then half-cosine to 0."""

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(1.0, warmup_steps)
        progress = (step - warmup_steps) / jnp.maximum(
            1.0, total_steps - warmup_steps
        )
        cos = jnp.maximum(0.0, 0.5 * (1.0 + jnp.cos(math.pi * progress)))
        return base_lr * jnp.where(step < warmup_steps, warm, cos)

    return fn


def _is_conv_in(path) -> bool:
    return any(getattr(k, "key", None) == "conv_in" for k in path)


def make_generator_optimizer(cfg: TrainConfig, vae_ch: int, g_params):
    """Two param groups (vae_trainer.py:455-468): lr = learning_rate_vae /
    vae_ch (muP-style width scaling) for everything except conv_in layers,
    which get a fixed 1e-4 base; both follow the cosine schedule (torch's
    LambdaLR steps every group). AdamW wd=1e-3, betas (0.9, 0.95)."""
    labels = jax.tree_util.tree_map_with_path(
        lambda path, _: "conv_in" if _is_conv_in(path) else "rest", g_params
    )
    common = dict(b1=cfg.beta1, b2=cfg.beta2, weight_decay=cfg.weight_decay)
    tx = optax.multi_transform(
        {
            "rest": optax.adamw(
                hf_cosine_schedule(
                    cfg.learning_rate_vae / vae_ch, cfg.warmup_steps, cfg.max_steps
                ),
                **common,
            ),
            "conv_in": optax.adamw(
                hf_cosine_schedule(1e-4, cfg.warmup_steps, cfg.max_steps), **common
            ),
        },
        labels,
    )
    return tx


def make_discriminator_optimizer(cfg: TrainConfig):
    """AdamW, constant lr (no scheduler on D; vae_trainer.py:470-475)."""
    return optax.adamw(
        cfg.learning_rate_disc,
        b1=cfg.beta1,
        b2=cfg.beta2,
        weight_decay=cfg.weight_decay,
    )


def create_train_state(
    cfg: TrainConfig,
    g_params,
    d_params: Optional[Any],
    vae_ch: int,
    rng: jax.Array,
    vq_ema: Optional[Any] = None,
):
    g_tx = make_generator_optimizer(cfg, vae_ch, g_params)
    g_opt = g_tx.init(g_params)
    if d_params is not None:
        d_tx = make_discriminator_optimizer(cfg)
        d_opt = d_tx.init(d_params)
    else:
        d_tx, d_opt = None, None
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        g_params=g_params,
        g_opt=g_opt,
        d_params=d_params,
        d_opt=d_opt,
        lecam_real=jnp.zeros((), jnp.float32),
        lecam_fake=jnp.zeros((), jnp.float32),
        rng=rng,
        vq_ema=vq_ema,
        # EMA starts at the initial weights (Polyak convention); a real copy
        # so state donation can never alias it to g_params
        g_ema=(
            jax.tree_util.tree_map(jnp.copy, g_params)
            if cfg.ema_decay > 0
            else None
        ),
    )
    return state, g_tx, d_tx
