"""The jitted GAN train step — the framework's hot loop.

One XLA program per step variant (crop on/off), fully on-device, with the
training state donated. Reference semantics (vae_trainer.py:524-704) with a
TPU-native restructure:

  - the reference runs generator forward once, D backward with
    retain_graph=True, then G backward over the same graph (:658,701). Here
    the generator forward is computed once under ``jax.vjp``; the D update
    consumes ``stop_gradient(recon)`` and the G cotangent flows back through
    the saved vjp — one generator forward + one generator backward per step,
    no recompute;
  - GradNorm branches (w=1.0 LPIPS / 0.001 MSE / 1.0 GAN; :662,679,683) are
    ``jax.custom_vjp`` identities; their norms are global under pjit
    (ops/gradnorm.py) so the reference's in-backward all_reduce disappears;
  - flips are traced ``jnp.where`` selects (both branches cost one cheap
    elementwise pass — no recompiles); the shape-changing latent crop
    (:577-621) is a *static* variant: a fixed crop size with traced random
    offsets, compiled once per (crop, no-crop), selected host-side with
    p=0.5 — the jit-friendly redesign of the reference's random-size crop;
  - D update precedes G update and the G GAN loss sees the *updated*
    discriminator, matching the reference's optimizer_D.step() before the G
    forward through D (:659,684);
  - LeCam anchors are EMA'd from globally-averaged logits before the penalty
    is applied, matching :639-655;
  - z statistics (quantiles, kurtosis, skewness; :540-559) are computed
    on-device and returned in the metrics dict.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from vqgan_tpu.config import TrainConfig, VAEConfig
from vqgan_tpu.losses.gan import (
    gan_disc_loss,
    generator_gan_loss,
    lecam_penalty,
    update_lecam_anchors,
)
from vqgan_tpu.losses.recon import vae_loss_function
from vqgan_tpu.ops.gradnorm import gradnorm
from vqgan_tpu.ops.resize import resize_area
from vqgan_tpu.train.state import TrainState


def _rand_flip(rng, arrays, axis: int):
    """Flip all arrays along ``axis`` with probability 0.5 (one coin)."""
    flag = jax.random.bernoulli(rng)
    return tuple(
        jnp.where(flag, jnp.flip(a, axis=axis), a) for a in arrays
    )


def _latent_flip(rng, z_s, target, spatial_axis: int, neg_lo: int, neg_hi: int):
    """Latent flip equivariance (vae_trainer.py:567-575): flip z_s and the
    target along one spatial axis and negate latent channels [neg_lo:neg_hi]
    (the sign channels of the Z₂×Z₂-equivariant latent, README.hf.md:9-15)."""
    flag = jax.random.bernoulli(rng)
    c = z_s.shape[-1]
    idx = jnp.arange(c)
    lo = c + neg_lo if neg_lo < 0 else neg_lo
    hi = c + neg_hi if neg_hi < 0 else neg_hi
    sign = jnp.where((idx >= lo) & (idx < hi), -1.0, 1.0).astype(z_s.dtype)
    z_flipped = jnp.flip(z_s, axis=spatial_axis) * sign
    z_new = jnp.where(flag, z_flipped, z_s)
    t_new = jnp.where(flag, jnp.flip(target, axis=spatial_axis), target)
    return z_new, t_new


def _z_statistics(z: jax.Array) -> Dict[str, jax.Array]:
    """Quantiles {0,.2,...,1}, kurtosis, skewness (vae_trainer.py:540-559)."""
    zf = z.astype(jnp.float32).reshape(-1)
    qs = jnp.quantile(zf, jnp.array([0.0, 0.2, 0.4, 0.6, 0.8, 1.0]))
    mean = zf.mean()
    std = zf.std()
    centered = zf - mean
    kurt = jnp.mean(centered**4) / (std**4 + 1e-12)
    skew = jnp.mean(centered**3) / (std**3 + 1e-12)
    out = {f"z_quantiles/{q:.1f}": qs[i] for i, q in enumerate([0.0, 0.2, 0.4, 0.6, 0.8, 1.0])}
    out["z_quantiles/kurtosis"] = kurt
    out["z_quantiles/skewness"] = skew
    return out


def make_train_step(
    cfg: TrainConfig,
    vae_cfg: VAEConfig,
    vae_model,
    disc_model,
    lpips_model,
    g_tx,
    d_tx,
    gradnorm_shards: int = 1,
) -> Callable:
    """Returns step(state, batch, lpips_params, do_crop: static bool).

    ``gradnorm_shards``: data-parallel extent for
    cfg.gradnorm_mode="mean_shard_norm" (reference per-rank norm averaging,
    ops/gradnorm.py); 1 = global-norm mode."""

    if cfg.gradnorm_mode not in ("global", "mean_shard_norm"):
        raise ValueError(f"unknown gradnorm_mode {cfg.gradnorm_mode!r}")
    gn_shards = gradnorm_shards if cfg.gradnorm_mode == "mean_shard_norm" else 1

    enc_res = vae_cfg.resolution
    hr = vae_cfg.decoder_also_perform_hr
    tgt_res = enc_res * (2 if hr else 1)
    ds_factor = cfg.downscale_factor * (2 if hr else 1)

    def encode(g_params, x):
        return vae_model.apply({"params": g_params}, x, method=vae_model.encode)

    def decode(g_params, z):
        return vae_model.apply({"params": g_params}, z, method=vae_model.decode)

    use_vq_ema = vae_cfg.reg_type == "vq" and vae_cfg.vq_ema_decay > 0

    def regularize(g_params, vq_ema, z, rng):
        """→ (z_s, aux_loss, new_vq_ema or None)."""
        if use_vq_ema:
            (z_q, aux), new_vars = vae_model.apply(
                {"params": g_params, "vq_ema": vq_ema},
                z,
                True,  # update_stats
                method=vae_model.regularize,
                rngs={"sample": rng},
                mutable=["vq_ema"],
            )
            return (
                z_q,
                aux["vq_loss"],
                jax.lax.stop_gradient(new_vars["vq_ema"]),
            )
        out = vae_model.apply(
            {"params": g_params}, z,
            method=vae_model.regularize,
            rngs={"sample": rng},
        )
        if isinstance(out, tuple):  # VQ (loss-based): (z_q, aux)
            return out[0], out[1]["vq_loss"], None
        return out, jnp.zeros((), jnp.float32), None

    def gen_forward(g_params, vq_ema, batch_hr, rngs, do_crop: int):
        """batch (B,S,S,3) → (recon, z, target, aux_loss, z_pre, new_ema).
        Differentiable in g_params; target carries no parameter gradient.
        ``do_crop``: 0/False = no crop; k >= 1 = crop bucket k (static)."""
        if batch_hr.dtype == jnp.uint8:
            # device-side normalization (loader device_normalize mode): the
            # H2D transfer carried uint8; this matches the host-side
            # uint8/127.5 - 1 bit for bit. Trace-time branch — free under jit.
            batch_hr = batch_hr.astype(jnp.float32) / 127.5 - 1.0
        x_enc = resize_area(batch_hr, (enc_res, enc_res))
        target = resize_area(batch_hr, (tgt_res, tgt_res))
        # always-on random horizontal flip of inputs (vae_trainer.py:534-536)
        x_enc, target = _rand_flip(rngs["flip_in"], (x_enc, target), axis=2)

        z = encode(g_params, x_enc)
        # z statistics are taken PRE-clamp (reference vae_trainer.py:540-561)
        z_pre = jax.lax.stop_gradient(z)
        if cfg.do_clamp:  # vae_trainer.py:561-562
            z = jnp.clip(z, -cfg.clamp_th, cfg.clamp_th)
        z_s, aux_loss, new_ema = regularize(g_params, vq_ema, z, rngs["sample"])

        if cfg.flip_invariance:  # vae_trainer.py:567-575
            c = z_s.shape[-1]
            z_s, target = _latent_flip(rngs["flip_w"], z_s, target, 2, -4, -2)
            z_s, target = _latent_flip(rngs["flip_h"], z_s, target, 1, -2, c)

        if do_crop:
            # static bucketed crop size, traced offsets (redesign of
            # :577-621): do_crop is a 1-based bucket index into
            # cfg.crop_fractions (True == 1 keeps the boolean API working —
            # bucket 1 is 0.75, the pre-bucketing default)
            if int(do_crop) > len(cfg.crop_fractions):
                raise ValueError(
                    f"crop bucket {int(do_crop)} out of range for "
                    f"crop_fractions {cfg.crop_fractions}"
                )
            frac = cfg.crop_fractions[int(do_crop) - 1]
            zh, zw = z_s.shape[1], z_s.shape[2]
            ch = max(1, int(round(frac * zh)))
            cw = max(1, int(round(frac * zw)))
            koff_h, koff_w = jax.random.split(rngs["crop"])
            off_h = jax.random.randint(koff_h, (), 0, zh - ch + 1)
            off_w = jax.random.randint(koff_w, (), 0, zw - cw + 1)
            z_s = jax.lax.dynamic_slice(
                z_s, (0, off_h, off_w, 0), (z_s.shape[0], ch, cw, z_s.shape[3])
            )
            target = jax.lax.dynamic_slice(
                target,
                (0, off_h * ds_factor, off_w * ds_factor, 0),
                (target.shape[0], ch * ds_factor, cw * ds_factor, target.shape[3]),
            )

        recon = decode(g_params, z_s)
        return recon, z, target, aux_loss, z_pre, new_ema

    def disc_apply(d_params, x):
        return disc_model.apply({"params": d_params}, x)

    def lpips_apply(lpips_params, x, y):
        return lpips_model.apply({"params": lpips_params}, x, y)

    if vae_cfg.remat:
        # in memory-constrained configs also rematerialize the VGG towers of
        # the loss branches (their taps at full image resolution dominate
        # residual memory at 512px)
        disc_apply = jax.checkpoint(disc_apply)
        lpips_apply = jax.checkpoint(lpips_apply)

    def g_losses(recon, z, aux_loss, target, d_params, lpips_params, rngs):
        """All generator loss branches over (recon, z, aux_loss); reference
        vae_trainer.py:662-698."""
        metrics = {}
        recon_lpips = gradnorm(recon, cfg.gradnorm_lpips, None, gn_shards)
        target_aug = target
        if cfg.augment_before_perceptual_loss:  # :664-674
            recon_lpips, target_aug = _rand_flip(
                rngs["aug_lpips_w"], (recon_lpips, target_aug), axis=2
            )
            recon_lpips, target_aug = _rand_flip(
                rngs["aug_lpips_h"], (recon_lpips, target_aug), axis=1
            )
        percep = lpips_apply(
            lpips_params, recon_lpips.astype(jnp.float32), target_aug
        ).mean()
        metrics["perceptual_loss"] = percep

        recon_mse = gradnorm(recon, cfg.gradnorm_mse, None, gn_shards)
        vae_loss, vae_metrics = vae_loss_function(
            target,
            recon_mse.astype(jnp.float32),
            z,
            do_pool=cfg.do_pool_recon,
            recon_weight=cfg.recon_weight,
            z_reg_weight=cfg.z_reg_weight,
        )
        metrics.update({f"{k}": v for k, v in vae_metrics.items()})

        total = percep + vae_loss + aux_loss
        if cfg.do_ganloss:
            recon_gan = gradnorm(recon, cfg.gradnorm_gan, None, gn_shards)
            fake_preds = disc_apply(d_params, recon_gan.astype(jnp.float32))
            g_gan = generator_gan_loss(fake_preds, cfg.disc_type)
            metrics["gan/generator_gan_loss"] = g_gan
            total = total + g_gan
        metrics["overall_vae_loss"] = total
        if vae_cfg.reg_type == "vq":
            metrics["vq_loss"] = aux_loss
        return total, metrics

    def step(
        state: TrainState,
        batch: jax.Array,
        lpips_params,
        do_crop: int,  # static: 0 = no crop, k >= 1 = crop bucket k
    ) -> Tuple[TrainState, Dict[str, jax.Array]]:
        rng, new_rng = jax.random.split(state.rng)
        keys = jax.random.split(rng, 8)
        rngs = {
            "flip_in": keys[0],
            "sample": keys[1],
            "flip_w": keys[2],
            "flip_h": keys[3],
            "crop": keys[4],
            "aug_lpips_w": keys[5],
            "aug_lpips_h": keys[6],
        }

        # --- shared generator forward (one fwd, one bwd total) ---
        (recon, z, target, aux_loss, z_pre, new_ema), gen_vjp = jax.vjp(
            lambda p: gen_forward(p, state.vq_ema, batch, rngs, do_crop),
            state.g_params,
        )
        metrics = _z_statistics(z_pre)

        # --- discriminator update (before G, reference :629-659) ---
        d_params = state.d_params
        d_opt = state.d_opt
        lecam_real, lecam_fake = state.lecam_real, state.lecam_fake
        if cfg.do_ganloss:
            recon_const = jax.lax.stop_gradient(recon.astype(jnp.float32))

            def d_loss_fn(dp):
                real_preds = disc_apply(dp, target)
                fake_preds = disc_apply(dp, recon_const)
                d_loss, d_metrics = gan_disc_loss(
                    real_preds, fake_preds, cfg.disc_type
                )
                # anchors EMA'd from (globally averaged) logits FIRST, then
                # the penalty uses the new anchors (reference :639-655)
                new_real, new_fake = update_lecam_anchors(
                    lecam_real,
                    lecam_fake,
                    jax.lax.stop_gradient(d_metrics["avg_real_logits"]),
                    jax.lax.stop_gradient(d_metrics["avg_fake_logits"]),
                    cfg.lecam_beta,
                )
                total_d = d_loss
                lecam_val = jnp.zeros((), jnp.float32)
                if cfg.use_lecam:
                    lecam_val = lecam_penalty(
                        real_preds, fake_preds, new_real, new_fake
                    )
                    total_d = total_d + cfg.lecam_weight * lecam_val
                aux = (d_metrics, d_loss, lecam_val, new_real, new_fake)
                return total_d, aux

            (_, (d_metrics, d_loss, lecam_val, lecam_real, lecam_fake)), d_grads = (
                jax.value_and_grad(d_loss_fn, has_aux=True)(d_params)
            )
            d_updates, d_opt = d_tx.update(d_grads, d_opt, d_params)
            d_params = optax.apply_updates(d_params, d_updates)
            metrics["gan/discriminator_loss"] = d_loss
            metrics["gan/discriminator_accuracy"] = d_metrics["disc_acc"]
            metrics["gan/avg_real_logits"] = d_metrics["avg_real_logits"]
            metrics["gan/avg_fake_logits"] = d_metrics["avg_fake_logits"]
            metrics["gan/lecam_loss"] = lecam_val
            metrics["gan/lecam_anchor_real_logits"] = lecam_real
            metrics["gan/lecam_anchor_fake_logits"] = lecam_fake

        # --- generator update through the saved vjp ---
        g_total, g_pullback, g_metrics = jax.vjp(
            lambda r, zz, al: g_losses(
                r, zz, al, target, d_params, lpips_params, rngs
            ),
            recon,
            z,
            aux_loss,
            has_aux=True,
        )
        d_recon, d_z, d_aux = g_pullback(jnp.ones((), g_total.dtype))
        (g_grads,) = gen_vjp(
            (
                d_recon,
                d_z,
                jnp.zeros_like(target),
                d_aux,
                jnp.zeros_like(z_pre),
                jax.tree_util.tree_map(jnp.zeros_like, new_ema),
            )
        )
        new_state = _finish(
            state, g_grads, d_params, d_opt, lecam_real, lecam_fake,
            new_rng, new_ema, z, keys[7],
        )
        metrics.update(g_metrics)
        return new_state, metrics

    def _finish(
        state, g_grads, d_params, d_opt, lecam_real, lecam_fake,
        new_rng, new_ema, z_for_revive, revive_key,
    ):
        """Shared step tail: G optimizer update, VQ codebook fold, Polyak
        EMA, next TrainState."""
        g_updates, g_opt = g_tx.update(g_grads, state.g_opt, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)

        if use_vq_ema:
            # fold the EMA statistics into the codebook (overwrites whatever
            # adam did to it — the codebook receives no gradient in EMA mode)
            from vqgan_tpu.models.quant import (
                apply_ema_codebook_update,
                revive_dead_codes,
            )

            new_cb = apply_ema_codebook_update(
                {"codebook": g_params["reg"]["codebook"]}, new_ema["reg"]
            )["codebook"]
            if vae_cfg.vq_revive_threshold > 0:
                flat_z = jax.lax.stop_gradient(z_for_revive).astype(jnp.float32)
                flat_z = flat_z.reshape(-1, flat_z.shape[-1])
                new_cb = revive_dead_codes(
                    new_cb,
                    new_ema["reg"]["counts"],
                    flat_z,
                    revive_key,
                    threshold=vae_cfg.vq_revive_threshold,
                )
            g_params = {
                **g_params,
                "reg": {**g_params["reg"], "codebook": new_cb},
            }

        if cfg.ema_decay > 0:
            # Polyak average tracks the post-update weights (incl. the VQ
            # codebook fold above)
            g_ema = jax.tree_util.tree_map(
                lambda e, p: cfg.ema_decay * e
                + (1.0 - cfg.ema_decay) * p.astype(e.dtype),
                state.g_ema,
                g_params,
            )
        else:
            g_ema = state.g_ema

        return TrainState(
            step=state.step + 1,
            g_params=g_params,
            g_opt=g_opt,
            d_params=d_params,
            d_opt=d_opt,
            lecam_real=lecam_real,
            lecam_fake=lecam_fake,
            rng=new_rng,
            vq_ema=new_ema,
            g_ema=g_ema,
        )

    if cfg.grad_accum <= 1:
        return step

    # ------------------------------------------------------------------
    # Gradient-accumulation variant (cfg.grad_accum > 1): the global batch
    # is processed in `accum` microbatches so the EFFECTIVE batch can exceed
    # what fits in HBM — e.g. the reference's 8×80GB-GPU HDR recipe at its
    # full effective batch of 32 on one 16 GB chip. Semantics = "one step at
    # the bigger batch", with these documented deltas:
    #   - GradNorm normalizes each microbatch's branch cotangent by that
    #     microbatch's own norm (the same normalization family the reference
    #     applies per rank, with microbatches as virtual ranks);
    #   - LeCam anchors advance once per microbatch during the D scan
    #     (a slow β=0.9 EMA; equals reference behavior at batch=mb for
    #     `accum` consecutive steps);
    #   - z-quantile telemetry is the mean of per-microbatch quantiles.
    # D sees every microbatch before G (D update between the two scans), and
    # the G scan recomputes the generator forward (one extra fwd per step —
    # the price of not holding all microbatch residuals at once, which would
    # be the full-batch memory this mode exists to avoid).
    # ------------------------------------------------------------------
    accum = cfg.grad_accum

    def step_accum(
        state: TrainState,
        batch: jax.Array,
        lpips_params,
        do_crop: int,
    ) -> Tuple[TrainState, Dict[str, jax.Array]]:
        rng, new_rng = jax.random.split(state.rng)
        keys = jax.random.split(rng, 8)
        b = batch.shape[0]
        if b % accum:
            raise ValueError(f"batch {b} not divisible by grad_accum {accum}")
        mbatch = batch.reshape(accum, b // accum, *batch.shape[1:])

        def mb_rngs(i):
            # one coin per STEP for flips/crops (the whole effective batch
            # flips together, like the reference's per-batch coins); fresh
            # sampler noise per microbatch (iid across the effective batch)
            return {
                "flip_in": keys[0],
                "sample": jax.random.fold_in(keys[1], i),
                "flip_w": keys[2],
                "flip_h": keys[3],
                "crop": keys[4],
                "aug_lpips_w": keys[5],
                "aug_lpips_h": keys[6],
            }

        zeros_g = jax.tree_util.tree_map(jnp.zeros_like, state.g_params)

        d_params = state.d_params
        d_opt = state.d_opt
        lecam_real, lecam_fake = state.lecam_real, state.lecam_fake
        d_metrics_mean = {}
        if cfg.do_ganloss:
            # --- scan 1: accumulate D grads over microbatches (recon
            # stop-gradded; anchors advance sequentially) ---
            def d_scan(carry, xs):
                d_acc, lr, lf = carry
                i, xb = xs
                recon, _, target, _, _, _ = gen_forward(
                    state.g_params, state.vq_ema, xb, mb_rngs(i), do_crop
                )
                recon_const = jax.lax.stop_gradient(recon.astype(jnp.float32))

                def d_loss_fn(dp):
                    real_preds = disc_apply(dp, target)
                    fake_preds = disc_apply(dp, recon_const)
                    d_loss, d_metrics = gan_disc_loss(
                        real_preds, fake_preds, cfg.disc_type
                    )
                    new_real, new_fake = update_lecam_anchors(
                        lr, lf,
                        jax.lax.stop_gradient(d_metrics["avg_real_logits"]),
                        jax.lax.stop_gradient(d_metrics["avg_fake_logits"]),
                        cfg.lecam_beta,
                    )
                    total_d = d_loss
                    lecam_val = jnp.zeros((), jnp.float32)
                    if cfg.use_lecam:
                        lecam_val = lecam_penalty(
                            real_preds, fake_preds, new_real, new_fake
                        )
                        total_d = total_d + cfg.lecam_weight * lecam_val
                    return total_d, (d_metrics, d_loss, lecam_val, new_real, new_fake)

                (_, (d_m, d_loss, lecam_val, lr, lf)), d_g = (
                    jax.value_and_grad(d_loss_fn, has_aux=True)(d_params)
                )
                d_acc = jax.tree_util.tree_map(
                    lambda a, g: a + g / accum, d_acc, d_g
                )
                out = {
                    "gan/discriminator_loss": d_loss,
                    "gan/discriminator_accuracy": d_m["disc_acc"],
                    "gan/avg_real_logits": d_m["avg_real_logits"],
                    "gan/avg_fake_logits": d_m["avg_fake_logits"],
                    "gan/lecam_loss": lecam_val,
                }
                return (d_acc, lr, lf), out

            zeros_d = jax.tree_util.tree_map(jnp.zeros_like, d_params)
            (d_grads, lecam_real, lecam_fake), d_outs = jax.lax.scan(
                d_scan, (zeros_d, lecam_real, lecam_fake),
                (jnp.arange(accum), mbatch),
            )
            d_metrics_mean = {k: v.mean() for k, v in d_outs.items()}
            d_metrics_mean["gan/lecam_anchor_real_logits"] = lecam_real
            d_metrics_mean["gan/lecam_anchor_fake_logits"] = lecam_fake
            d_updates, d_opt = d_tx.update(d_grads, d_opt, d_params)
            d_params = optax.apply_updates(d_params, d_updates)

        # --- scan 2: accumulate G grads with the UPDATED discriminator
        # (generator forward recomputed per microbatch) ---
        def g_scan(carry, xs):
            g_acc, vq_ema_c = carry
            i, xb = xs
            rngs_i = mb_rngs(i)
            (recon, z, target, aux_loss, z_pre, new_ema), gen_vjp = jax.vjp(
                lambda p: gen_forward(p, vq_ema_c, xb, rngs_i, do_crop),
                state.g_params,
            )
            g_total, g_pullback, g_metrics = jax.vjp(
                lambda r, zz, al: g_losses(
                    r, zz, al, target, d_params, lpips_params, rngs_i
                ),
                recon, z, aux_loss,
                has_aux=True,
            )
            d_recon, d_z, d_aux = g_pullback(jnp.ones((), g_total.dtype))
            (g_g,) = gen_vjp(
                (
                    d_recon,
                    d_z,
                    jnp.zeros_like(target),
                    d_aux,
                    jnp.zeros_like(z_pre),
                    jax.tree_util.tree_map(jnp.zeros_like, new_ema),
                )
            )
            g_acc = jax.tree_util.tree_map(
                lambda a, g: a + g / accum, g_acc, g_g
            )
            outs = dict(g_metrics)
            outs.update(_z_statistics(z_pre))
            # keep one microbatch's latents for dead-code revival sampling
            return (g_acc, new_ema), (outs, jax.lax.stop_gradient(z))

        (g_grads, new_ema), (g_outs, z_all) = jax.lax.scan(
            g_scan, (zeros_g, state.vq_ema), (jnp.arange(accum), mbatch)
        )
        metrics = {k: v.mean() for k, v in g_outs.items()}
        metrics.update(d_metrics_mean)

        new_state = _finish(
            state, g_grads, d_params, d_opt, lecam_real, lecam_fake,
            new_rng, new_ema, z_all, keys[7],
        )
        return new_state, metrics

    return step_accum
