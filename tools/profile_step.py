"""Capture a jax.profiler trace of the training step (SURVEY.md §5 tracing).

    python tools/profile_step.py --out /tmp/trace [--batch 8] [--res 256]

Produces a TensorBoard-compatible trace directory plus a step-time summary on
stdout. Equivalent role to the reference's wall-clock telemetry
(time_taken_till_step, vae_trainer.py:710) with full device-level visibility.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/vqgan_trace")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--ch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--gan", type=lambda s: s == "true", default=True)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vqgan_tpu.config import TrainConfig, VAEConfig
    from vqgan_tpu.losses.discriminator import PatchDiscriminator
    from vqgan_tpu.losses.lpips import LPIPS
    from vqgan_tpu.models.ae import VAE
    from vqgan_tpu.train.state import create_train_state
    from vqgan_tpu.train.step import make_train_step

    vae_cfg = VAEConfig(
        resolution=args.res, ch=args.ch, enc_dtype="bfloat16", dec_dtype="bfloat16"
    )
    cfg = TrainConfig(
        batch_size=args.batch, image_size=args.res, max_steps=10_000,
        do_ganloss=args.gan, disc_type="hinge",
    )
    rng = jax.random.PRNGKey(0)
    vae = VAE(cfg=vae_cfg)
    x0 = jnp.zeros((1, args.res, args.res, 3))
    g_params = vae.init({"params": rng, "sample": rng}, x0)["params"]
    disc = PatchDiscriminator(dtype=jnp.bfloat16)
    d_params = disc.init(jax.random.PRNGKey(1), x0)["params"] if args.gan else None
    lpips = LPIPS(dtype=jnp.bfloat16)
    lpips_params = lpips.init(jax.random.PRNGKey(2), x0, x0)["params"]
    state, g_tx, d_tx = create_train_state(
        cfg, g_params, d_params, vae_cfg.ch, jax.random.PRNGKey(3)
    )
    step = jax.jit(
        make_train_step(cfg, vae_cfg, vae, disc, lpips, g_tx, d_tx),
        static_argnums=(3,), donate_argnums=(0,),
    )
    batch = jnp.asarray(
        np.random.RandomState(0)
        .uniform(-1, 1, (args.batch, args.res, args.res, 3))
        .astype(np.float32)
    )
    # warmup/compile
    state, metrics = step(state, batch, lpips_params, False)
    float(metrics["overall_vae_loss"])  # host-fetch sync (axon quirk)

    jax.profiler.start_trace(args.out)
    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, metrics = step(state, batch, lpips_params, False)
    loss = float(metrics["overall_vae_loss"])
    dt = (time.perf_counter() - t0) / args.steps
    jax.profiler.stop_trace()
    print(f"trace written to {args.out}; {dt:.3f}s/step, loss={loss:.4f}")


if __name__ == "__main__":
    main()
