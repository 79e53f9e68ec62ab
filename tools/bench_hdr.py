"""HDR production-recipe throughput on the real chip (VERDICT r4 #3).

The reference's heaviest config (scripts/launch_hdr.sh:3-30: ch=128,
ch_mult 1,2,4,4,4, z=64, wavelet encoder, HR decoder 256->512, hinge+LeCam
GAN, flip+crop equivariance) timed as the full jitted GAN train step at
512px input, remat + full-bf16 — the exact configuration the r1/r2
BASELINE.md rows measured, re-run on the r5 code (dilated upsample, LPIPS
split, GroupNorm custom-VJP all land on this recipe).

The trainer runs 50/50 no-crop / crop-bucket steps
(train/trainer.py:335-341, reference vae_trainer.py:577); both variants are
separate static compiles, so each is timed and the blended rate reported.

    python tools/bench_hdr.py --batch 8 [--skip_crop]

Prints ONE JSON line per batch size.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

IMAGE_RES = 512
WARMUP_STEPS = 2
MEASURE_STEPS = 8


def build(batch_size: int):
    from vqgan_tpu.config import TrainConfig, VAEConfig
    from vqgan_tpu.losses.discriminator import PatchDiscriminator
    from vqgan_tpu.losses.lpips import LPIPS
    from vqgan_tpu.models.ae import VAE
    from vqgan_tpu.train.state import create_train_state
    from vqgan_tpu.train.step import make_train_step

    vae_cfg = VAEConfig(
        resolution=256,
        ch=128,
        ch_mult=(1, 2, 4, 4, 4),
        z_channels=64,
        use_wavelet=True,
        decoder_also_perform_hr=True,
        remat=True,
        enc_dtype="bfloat16",  # --full_bf16 true (trainer.py:81-83)
        dec_dtype="bfloat16",
    )
    cfg = TrainConfig(
        batch_size=batch_size,
        image_size=IMAGE_RES,
        max_steps=100_000,
        learning_rate_vae=2**-7,
        learning_rate_disc=3e-5,
        do_ganloss=True,
        disc_type="hinge",
        use_lecam=True,
        do_clamp=True,
        clamp_th=8.0,
        flip_invariance=True,
        crop_invariance=True,
        full_bf16=True,
    )
    rng = jax.random.PRNGKey(0)
    vae = VAE(cfg=vae_cfg)
    x0 = jnp.zeros((1, 256, 256, 3))
    g_params = vae.init({"params": rng, "sample": rng}, x0)["params"]
    disc = PatchDiscriminator(dtype=jnp.bfloat16)
    d_params = disc.init(jax.random.PRNGKey(1), x0)["params"]
    lpips = LPIPS(dtype=jnp.bfloat16)
    lpips_params = lpips.init(jax.random.PRNGKey(2), x0, x0)["params"]
    state, g_tx, d_tx = create_train_state(
        cfg, g_params, d_params, vae_cfg.ch, jax.random.PRNGKey(3)
    )
    step = jax.jit(
        make_train_step(cfg, vae_cfg, vae, disc, lpips, g_tx, d_tx),
        static_argnums=(3,),
        donate_argnums=(0,),
    )
    batch = jax.device_put(
        jnp.asarray(
            np.random.RandomState(0)
            .uniform(-1, 1, (batch_size, IMAGE_RES, IMAGE_RES, 3))
            .astype(np.float32)
        )
    )
    return state, step, batch, lpips_params


def time_variant(state, step, batch, lpips_params, do_crop: int):
    t_compile = time.perf_counter()
    for _ in range(WARMUP_STEPS):
        state, metrics = step(state, batch, lpips_params, do_crop)
    float(metrics["overall_vae_loss"])  # host-fetch sync (axon tunnel)
    t_compile = time.perf_counter() - t_compile
    t0 = time.perf_counter()
    for _ in range(MEASURE_STEPS):
        state, metrics = step(state, batch, lpips_params, do_crop)
    loss = float(metrics["overall_vae_loss"])
    dt = (time.perf_counter() - t0) / MEASURE_STEPS
    assert np.isfinite(loss), f"non-finite loss {loss}"
    return state, dt, t_compile


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--skip_crop", action="store_true",
                   help="time only the no-crop variant (one compile)")
    args = p.parse_args()

    n_chips = max(1, jax.device_count())
    state, step, batch, lpips_params = build(args.batch)
    state, dt0, c0 = time_variant(state, step, batch, lpips_params, 0)
    rec = {
        "config": "hdr_stage4_512px",
        "batch": args.batch,
        "step_seconds_nocrop": round(dt0, 4),
        "compile_s_nocrop": round(c0, 1),
    }
    if not args.skip_crop:
        state, dt1, c1 = time_variant(state, step, batch, lpips_params, 1)
        blended = 0.5 * dt0 + 0.5 * dt1
        rec.update(
            step_seconds_crop=round(dt1, 4),
            compile_s_crop=round(c1, 1),
            step_seconds_blended=round(blended, 4),
            images_per_sec_per_chip=round(args.batch / blended / n_chips, 3),
        )
    else:
        rec["images_per_sec_per_chip"] = round(
            args.batch / dt0 / n_chips, 3
        )
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
