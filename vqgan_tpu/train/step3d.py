"""The jitted full-GAN train step for the video (TVAE) family.

The reference never trains tae.py (tae.py:300-314 is a forward smoke only),
so there is no reference hot loop to mirror — this brings the 2D trainer's
complete loss stack (reference vae_trainer.py:524-704: per-branch GradNorm,
LPIPS, PatchDiscriminator with BCE/hinge + LeCam, D-update-before-G with G
seeing the updated D) to video, applied per-frame:

  - the generator forward is encode → reparameterized Gaussian (+KL) or VQ →
    decode, computed once under ``jax.vjp`` (the 2D restructure, train/step.py);
  - LPIPS and the PatchDiscriminator are the 2D modules run on frames: the
    (B, T, H, W, 3) clip flattens to (B·T, H, W, 3). For long clips
    ``cfg.video_loss_frames`` bounds the cost: a strided frame subset with a
    traced random phase (static count → one XLA program) feeds the perceptual
    and GAN branches while the cheap L2 branch always sees every frame;
  - GradNorm branches (ops/gradnorm.py) balance LPIPS / L2 / GAN exactly as
    the 2D step does (vae_trainer.py:662,679,683);
  - LeCam anchors EMA over globally-averaged logits (vae_trainer.py:639-655).

State is the same donated ``TrainState`` pytree as the 2D trainer.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from vqgan_tpu.config import TrainConfig, TVAEConfig
from vqgan_tpu.losses.gan import (
    gan_disc_loss,
    generator_gan_loss,
    lecam_penalty,
    update_lecam_anchors,
)
from vqgan_tpu.ops.gradnorm import gradnorm
from vqgan_tpu.train.state import TrainState


def _frame_subset(rng, arrays, k: int):
    """Pick ``k`` evenly-strided frames with a traced random phase from each
    (B, T, ...) array. k <= 0 or k >= T keeps all frames. Static k → static
    shapes; a continuous random phase u ~ U[0,1) gives
    idx_i = floor((i + u) * T/k), so EVERY frame index has nonzero selection
    probability even when T % k != 0 (an integer shift bounded by
    floor(T/k) provably never reaches some frames, e.g. T=8, k=3 missed
    frames {4, 7}), indices stay strictly increasing (stride >= 1), and all
    frames are covered in expectation."""
    t = arrays[0].shape[1]
    if k <= 0 or k >= t:
        return arrays
    stride = t / k
    u = jax.random.uniform(rng, ())
    idx = jnp.floor((jnp.arange(k) + u) * stride).astype(jnp.int32)
    return tuple(jnp.take(a, idx, axis=1) for a in arrays)


def _flat_frames(x: jax.Array) -> jax.Array:
    """(B, T, H, W, C) → (B·T, H, W, C) for the 2D loss modules."""
    b, t, h, w, c = x.shape
    return x.reshape(b * t, h, w, c)


def make_train_step_3d_gan(
    cfg: TrainConfig,
    tvae_cfg: TVAEConfig,
    model,
    disc_model,
    lpips_model,
    g_tx,
    d_tx,
    gradnorm_shards: int = 1,
) -> Callable:
    """Returns step(state, batch, lpips_params) -> (state, metrics)."""

    kl_weight = cfg.z_reg_weight
    use_gan = cfg.do_ganloss
    if cfg.gradnorm_mode not in ("global", "mean_shard_norm"):
        raise ValueError(f"unknown gradnorm_mode {cfg.gradnorm_mode!r}")
    gn_shards = (
        gradnorm_shards if cfg.gradnorm_mode == "mean_shard_norm" else 1
    )
    use_vq_ema = tvae_cfg.reg_type == "vq" and tvae_cfg.vq_ema_decay > 0

    def regularize(g_params, vq_ema, z, rng_sample):
        """→ (z_s, reg_loss, new_vq_ema or None) — the 2D step's EMA-codebook
        machinery (train/step.py::regularize) on TVAE.regularize."""
        if tvae_cfg.reg_type == "gaussian":
            mean, logvar = jnp.split(z.astype(jnp.float32), 2, axis=-1)
            logvar = jnp.clip(logvar, min=-3.0)  # tae.py:262
            std = jnp.exp(0.5 * logvar)
            eps = jax.random.normal(rng_sample, mean.shape)
            z_s = (mean + std * eps).astype(z.dtype)
            reg = 0.5 * jnp.mean(mean**2 + jnp.exp(logvar) - 1.0 - logvar)
            return z_s, reg, None
        if use_vq_ema:
            (z_q, aux), new_vars = model.apply(
                {"params": g_params, "vq_ema": vq_ema},
                z,
                True,  # update_stats
                method=model.regularize,
                mutable=["vq_ema"],
            )
            return (
                z_q,
                aux["vq_loss"],
                jax.lax.stop_gradient(new_vars["vq_ema"]),
            )
        z_q, aux = model.apply(
            {"params": g_params}, z, method=model.regularize
        )
        return z_q, aux["vq_loss"], None

    def gen_forward(g_params, vq_ema, batch, rng_sample):
        """clip (B,T,H,W,3) → (recon, reg_loss, z, new_ema). Gaussian:
        reparameterized sample + KL (tae.py:253-266 semantics, KL replacing
        the 2D z² penalty); VQ: quantized latent + codebook loss (EMA stats
        threaded functionally, folded into the codebook in the step tail).
        ``z`` (pre-regularizer latent) feeds dead-code revival sampling."""
        z = model.apply({"params": g_params}, batch, method=model.encode)
        z_s, reg, new_ema = regularize(g_params, vq_ema, z, rng_sample)
        recon = model.apply({"params": g_params}, z_s, method=model.decode)
        return recon, reg, jax.lax.stop_gradient(z), new_ema

    def gen_forward_nostats(g_params, vq_ema, batch, rng_sample):
        """Forward-only recon for the discriminator pass: identical math to
        gen_forward, but the EMA-VQ quantizer runs with update_stats=False so
        the per-microbatch code_stats sums are never computed just to be
        discarded (ADVICE r3 — the stats advance exactly once per
        microbatch, in the G scan)."""
        z = model.apply({"params": g_params}, batch, method=model.encode)
        if tvae_cfg.reg_type == "gaussian" or not use_vq_ema:
            z_s, _, _ = regularize(g_params, vq_ema, z, rng_sample)
        else:
            z_s, _ = model.apply(
                {"params": g_params, "vq_ema": vq_ema},
                z,
                False,  # update_stats
                method=model.regularize,
            )
        return model.apply({"params": g_params}, z_s, method=model.decode)

    tubelet = cfg.disc_3d == "tubelet"

    def disc_in(clip: jax.Array) -> jax.Array:
        """Discriminator input: the frame disc sees a flattened (B·T) frame
        batch; the tubelet disc sees the (B, T, H, W, 3) clip itself."""
        clip = clip.astype(jnp.float32)
        return clip if tubelet else _flat_frames(clip)

    def disc_apply(d_params, frames):
        return disc_model.apply({"params": d_params}, frames)

    def lpips_apply(lpips_params, x, y):
        return lpips_model.apply({"params": lpips_params}, x, y)

    if tvae_cfg.remat:
        disc_apply = jax.checkpoint(disc_apply)
        lpips_apply = jax.checkpoint(lpips_apply)

    def g_losses(recon, reg_loss, batch, d_params, lpips_params, rng_frames):
        metrics = {}
        # heavy per-frame branches see the (possibly subsetted) frames;
        # the gradient flows back into only those frames of recon —
        # GradNorm then fixes each branch's scale exactly as in 2D
        recon_f, target_f = _frame_subset(
            rng_frames, (recon, batch), cfg.video_loss_frames
        )
        recon_lpips = gradnorm(recon_f, cfg.gradnorm_lpips, None, gn_shards)
        percep = lpips_apply(
            lpips_params,
            _flat_frames(recon_lpips.astype(jnp.float32)),
            _flat_frames(target_f.astype(jnp.float32)),
        ).mean()
        metrics["perceptual_loss"] = percep

        recon_mse = gradnorm(recon, cfg.gradnorm_mse, None, gn_shards)
        rec = jnp.mean(jnp.square(recon_mse.astype(jnp.float32) - batch))
        metrics["recon_l2"] = rec
        metrics["kl"] = reg_loss

        total = percep + rec + kl_weight * reg_loss
        if use_gan:
            recon_gan = gradnorm(recon_f, cfg.gradnorm_gan, None, gn_shards)
            fake_preds = disc_apply(d_params, disc_in(recon_gan))
            g_gan = generator_gan_loss(fake_preds, cfg.disc_type)
            metrics["gan/generator_gan_loss"] = g_gan
            total = total + g_gan
        metrics["overall_vae_loss"] = total
        metrics["loss"] = total
        return total, metrics

    def _fold_vq_ema(g_params, new_ema, z_for_revive, revive_key):
        """Overwrite the codebook with the EMA statistics (the codebook
        receives no gradient in EMA mode) + optional dead-code revival —
        same tail as the 2D step (train/step.py::_finish)."""
        if not use_vq_ema:
            return g_params
        from vqgan_tpu.models.quant import (
            apply_ema_codebook_update,
            revive_dead_codes,
        )

        new_cb = apply_ema_codebook_update(
            {"codebook": g_params["reg"]["codebook"]}, new_ema["reg"]
        )["codebook"]
        if tvae_cfg.vq_revive_threshold > 0:
            flat_z = z_for_revive.astype(jnp.float32)
            flat_z = flat_z.reshape(-1, flat_z.shape[-1])
            new_cb = revive_dead_codes(
                new_cb,
                new_ema["reg"]["counts"],
                flat_z,
                revive_key,
                threshold=tvae_cfg.vq_revive_threshold,
            )
        return {**g_params, "reg": {**g_params["reg"], "codebook": new_cb}}

    def step(
        state: TrainState, batch: jax.Array, lpips_params
    ) -> Tuple[TrainState, Dict[str, jax.Array]]:
        rng, new_rng = jax.random.split(state.rng)
        k_sample, k_frames, k_revive = jax.random.split(rng, 3)
        batch = batch.astype(jnp.float32)

        # --- shared generator forward (one fwd, one bwd total) ---
        (recon, reg_loss, z_lat, new_ema), gen_vjp = jax.vjp(
            lambda p: gen_forward(p, state.vq_ema, batch, k_sample),
            state.g_params,
        )
        metrics = {}

        # --- discriminator update (before G, 2D step parity) ---
        d_params = state.d_params
        d_opt = state.d_opt
        lecam_real, lecam_fake = state.lecam_real, state.lecam_fake
        if use_gan:
            recon_f, target_f = _frame_subset(
                k_frames,
                (jax.lax.stop_gradient(recon.astype(jnp.float32)), batch),
                cfg.video_loss_frames,
            )
            fake_frames = disc_in(recon_f)
            real_frames = disc_in(target_f)

            def d_loss_fn(dp):
                real_preds = disc_apply(dp, real_frames)
                fake_preds = disc_apply(dp, fake_frames)
                d_loss, d_metrics = gan_disc_loss(
                    real_preds, fake_preds, cfg.disc_type
                )
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

        # --- generator update through the saved vjp (G sees updated D) ---
        g_total, g_pullback, g_metrics = jax.vjp(
            lambda r, rl: g_losses(
                r, rl, batch, d_params, lpips_params, k_frames
            ),
            recon,
            reg_loss,
            has_aux=True,
        )
        d_recon, d_reg = g_pullback(jnp.ones((), g_total.dtype))
        (g_grads,) = gen_vjp(
            (
                d_recon,
                d_reg,
                jnp.zeros_like(z_lat),
                jax.tree_util.tree_map(jnp.zeros_like, new_ema),
            )
        )
        g_updates, g_opt = g_tx.update(g_grads, state.g_opt, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)
        g_params = _fold_vq_ema(g_params, new_ema, z_lat, k_revive)
        metrics.update(g_metrics)

        if cfg.ema_decay > 0:
            # Polyak average of the generator weights (same semantics as the
            # 2D step, train/step.py); tracks the post-fold codebook
            g_ema = jax.tree_util.tree_map(
                lambda e, p: cfg.ema_decay * e
                + (1.0 - cfg.ema_decay) * p.astype(e.dtype),
                state.g_ema,
                g_params,
            )
        else:
            g_ema = state.g_ema

        new_state = TrainState(
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
        return new_state, metrics

    if cfg.grad_accum <= 1:
        return step

    # ------------------------------------------------------------------
    # Gradient accumulation (cfg.grad_accum > 1) — the 2D design
    # (train/step.py::step_accum) applied to clips, where it matters most:
    # the effective CLIP batch can exceed HBM. Semantics = one step at the
    # bigger batch; D-grad scan over microbatches → D update → G-grad scan
    # against the UPDATED D (reference D-before-G ordering preserved).
    # LeCam anchors advance once per microbatch in the D scan; GradNorm
    # normalizes per microbatch (microbatches as virtual ranks); the G scan
    # recomputes the generator forward rather than holding every
    # microbatch's residuals — the memory this mode exists to avoid.
    # ------------------------------------------------------------------
    accum = cfg.grad_accum

    def step_accum(
        state: TrainState, batch: jax.Array, lpips_params
    ) -> Tuple[TrainState, Dict[str, jax.Array]]:
        rng, new_rng = jax.random.split(state.rng)
        k_sample, k_frames, k_revive = jax.random.split(rng, 3)
        b = batch.shape[0]
        if b % accum:
            raise ValueError(f"batch {b} not divisible by grad_accum {accum}")
        mbatch = batch.astype(jnp.float32).reshape(
            accum, b // accum, *batch.shape[1:]
        )

        zeros_g = jax.tree_util.tree_map(jnp.zeros_like, state.g_params)
        d_params, d_opt = state.d_params, state.d_opt
        lecam_real, lecam_fake = state.lecam_real, state.lecam_fake
        d_metrics_mean = {}
        if use_gan:
            def d_scan(carry, xs):
                d_acc, lr, lf = carry
                i, xb = xs
                recon = gen_forward_nostats(
                    state.g_params, state.vq_ema, xb,
                    jax.random.fold_in(k_sample, i),
                )
                recon_f, target_f = _frame_subset(
                    k_frames,
                    (jax.lax.stop_gradient(recon.astype(jnp.float32)), xb),
                    cfg.video_loss_frames,
                )
                fake_frames = disc_in(recon_f)
                real_frames = disc_in(target_f)

                def d_loss_fn(dp):
                    real_preds = disc_apply(dp, real_frames)
                    fake_preds = disc_apply(dp, fake_frames)
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
                    aux = (d_metrics, d_loss, lecam_val, new_real, new_fake)
                    return total_d, aux

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

        def g_scan(carry, xs):
            g_acc, vq_ema_c = carry
            i, xb = xs
            (recon, reg_loss, z_lat, new_ema), gen_vjp = jax.vjp(
                lambda p: gen_forward(
                    p, vq_ema_c, xb, jax.random.fold_in(k_sample, i)
                ),
                state.g_params,
            )
            g_total, g_pullback, g_metrics = jax.vjp(
                lambda r, rl: g_losses(
                    r, rl, xb, d_params, lpips_params, k_frames
                ),
                recon, reg_loss,
                has_aux=True,
            )
            d_recon, d_reg = g_pullback(jnp.ones((), g_total.dtype))
            (g_g,) = gen_vjp(
                (
                    d_recon,
                    d_reg,
                    jnp.zeros_like(z_lat),
                    jax.tree_util.tree_map(jnp.zeros_like, new_ema),
                )
            )
            g_acc = jax.tree_util.tree_map(
                lambda a, g: a + g / accum, g_acc, g_g
            )
            # z_lat stacks across ALL accum microbatches (lax.scan output);
            # _fold_vq_ema flattens the whole stack for revival sampling
            return (g_acc, new_ema), (g_metrics, z_lat)

        (g_grads, new_ema), (g_outs, z_all) = jax.lax.scan(
            g_scan, (zeros_g, state.vq_ema), (jnp.arange(accum), mbatch)
        )
        metrics = {k: v.mean() for k, v in g_outs.items()}
        metrics.update(d_metrics_mean)

        g_updates, g_opt = g_tx.update(g_grads, state.g_opt, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)
        g_params = _fold_vq_ema(g_params, new_ema, z_all, k_revive)
        if cfg.ema_decay > 0:
            g_ema = jax.tree_util.tree_map(
                lambda e, p: cfg.ema_decay * e
                + (1.0 - cfg.ema_decay) * p.astype(e.dtype),
                state.g_ema,
                g_params,
            )
        else:
            g_ema = state.g_ema

        new_state = TrainState(
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
        return new_state, metrics

    return step_accum
