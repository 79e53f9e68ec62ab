"""Headline benchmark: images/sec/chip for full GAN training at 256px.

Measures the complete training step (encoder + decoder + LPIPS + VGG patch
discriminator update + generator update, hinge GAN + LeCam + GradNorm) on
the flagship config (vae_ch=256, ch_mult 1,2,4,4, z=16 — the AuraEquiVAE
shape, reference CLI defaults vae_trainer.py:243-257) in bf16.

Baseline (see BASELINE.md): the reference publishes no numbers, so the
comparison point is an analytical roofline of the reference's own 8×A100
setup: measured step FLOPs / (312 TFLOP/s bf16 × 40% assumed MFU) per chip.
``vs_baseline`` = our measured images/sec/chip ÷ that estimate.

Prints ONE JSON line.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

A100_BF16_FLOPS = 312e12
ASSUMED_REF_MFU = 0.40  # generous to the reference (torch.compile max-autotune)

# The reference's own per-image step cost at this config: XLA cost analysis
# of the identical step with the canonical (direct, reference ae.py:157-167)
# decoder-upsample lowering — 12.244 TFLOP/img (BENCH_r02, BASELINE.md).
# Our step now computes the same function in fewer FLOPs (subpixel fused
# upsample, ops/subpixel.py), so the baseline must price the REFERENCE's
# math, not ours; flops_per_image in the JSON still reports our measured
# cost for MFU arithmetic.
REF_FLOPS_PER_IMAGE = 12.244367704064e12

IMAGE_RES = 256
WARMUP_STEPS = 3
MEASURE_STEPS = 10


def build(batch_size: int):
    from vqgan_tpu.config import TrainConfig, VAEConfig
    from vqgan_tpu.losses.discriminator import PatchDiscriminator
    from vqgan_tpu.losses.lpips import LPIPS
    from vqgan_tpu.models.ae import VAE
    from vqgan_tpu.train.state import create_train_state
    from vqgan_tpu.train.step import make_train_step

    vae_cfg = VAEConfig(
        resolution=IMAGE_RES,
        enc_dtype="bfloat16",  # perf mode: full-bf16 compute, fp32 params/GN
        dec_dtype="bfloat16",
    )
    cfg = TrainConfig(
        batch_size=batch_size,
        image_size=IMAGE_RES,
        max_steps=10_000,
        do_ganloss=True,
        disc_type="hinge",
        use_lecam=True,
        do_clamp=True,
    )
    rng = jax.random.PRNGKey(0)
    vae = VAE(cfg=vae_cfg)
    x0 = jnp.zeros((1, IMAGE_RES, IMAGE_RES, 3))
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


def try_bench(batch_size: int):
    state, step, batch, lpips_params = build(batch_size)
    lowered = None
    flops_per_step = None
    try:
        lowered = step.lower(state, batch, lpips_params, False)
        compiled = lowered.compile()
        cost = compiled.cost_analysis()
        if cost:
            c = cost[0] if isinstance(cost, (list, tuple)) else cost
            flops_per_step = float(c.get("flops", 0.0)) or None
    except Exception:
        compiled = None

    # warmup (also materializes the donated-state pipeline). NOTE: on the
    # axon-tunneled chip block_until_ready does not actually wait — a host
    # fetch of a scalar that depends on the full step chain is the only
    # reliable synchronization, so timing brackets use float(metric).
    for _ in range(WARMUP_STEPS):
        state, metrics = step(state, batch, lpips_params, False)
    float(metrics["overall_vae_loss"])  # sync

    t0 = time.perf_counter()
    for _ in range(MEASURE_STEPS):
        state, metrics = step(state, batch, lpips_params, False)
    loss = float(metrics["overall_vae_loss"])  # sync
    dt = time.perf_counter() - t0
    assert np.isfinite(loss), f"non-finite loss {loss}"
    imgs_per_sec = batch_size * MEASURE_STEPS / dt
    return imgs_per_sec, flops_per_step, dt / MEASURE_STEPS


def main():
    n_chips = max(1, jax.device_count())
    # Batch 8 first: the round-5 sweep (tools/bench_batch_sweep.py,
    # BASELINE.md) measured 15.93 img/s/chip at batch 8 vs 15.28 at batch 16
    # — at batch 16 XLA's automatic HBM-pressure rematerialization re-executes
    # ~7.5% of the step's FLOPs (cost analysis: 10.34 vs 9.78 TFLOP/img).
    # Batch 64 needs ~42GB of activations unrematerialized (~0.65 GB/img)
    # on a 16GB v5e chip; 24 does not compile.
    for batch_size in (8, 16, 4, 2, 1):
        try:
            ips, flops_per_step, step_s = try_bench(batch_size)
        except Exception as e:
            # OOM → halve the batch. Under the axon remote-compile tunnel an
            # HBM OOM surfaces as an opaque HTTP 500, so retry smaller on any
            # failure while a smaller batch remains.
            print(
                f"# batch {batch_size} failed ({type(e).__name__}), retrying smaller",
                file=sys.stderr,
            )
            if batch_size == 1:
                raise
            continue
        ips_per_chip = ips / n_chips
        flops_per_img = flops_per_step / batch_size if flops_per_step else None
        # price the reference's computation (direct-impl cost), never fewer
        # FLOPs than our own measured step actually does
        ref_cost = max(REF_FLOPS_PER_IMAGE, flops_per_img or 0.0)
        baseline_ips = ASSUMED_REF_MFU * A100_BF16_FLOPS / ref_cost
        result = {
            "metric": "images/sec/chip, 256px full GAN training (ch=256 VAE + VGG disc + LPIPS)",
            "value": round(ips_per_chip, 3),
            "unit": "images/sec/chip",
            "vs_baseline": round(ips_per_chip / baseline_ips, 3),
            "batch_size": batch_size,
            "step_seconds": round(step_s, 4),
            "platform": jax.devices()[0].platform,
            "flops_per_image": flops_per_img if flops_per_step else None,
        }
        print(json.dumps(result))
        return
    print(json.dumps({"metric": "bench failed", "value": 0, "unit": "", "vs_baseline": 0}))


if __name__ == "__main__":
    main()
