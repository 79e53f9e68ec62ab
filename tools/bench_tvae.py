"""3D video VAE training throughput on the real chip.

The reference's tae.py is forward-only (no trainer, no numbers). This
measures our full 3D training step (encode → reparameterized Gaussian → KL →
decode → L2, AdamW) in frames/sec/chip. One JSON line; BASELINE.md records
the result.

    python tools/bench_tvae.py --batch 2 --frames 16 --res 128 --ch 64
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")


def main():
    import click

    @click.command()
    @click.option("--batch", type=int, default=2)
    @click.option("--frames", type=int, default=16)
    @click.option("--res", type=int, default=128)
    @click.option("--ch", type=int, default=64)
    @click.option("--ch_mult", type=str, default="1,2,4")
    @click.option("--steps", type=int, default=8)
    @click.option("--dtype", type=str, default="bfloat16")
    @click.option("--remat", type=bool, default=False)
    @click.option("--remat_policy", type=str, default="full")
    @click.option("--conv3d_impl", type=str, default="auto")
    @click.option("--upsample_impl", type=str, default="direct")
    @click.option("--attn_chunk", type=int, default=0)
    @click.option("--attn_impl", type=str, default="auto",
                  help="auto | pallas | lax (ops/flash_attention.py)")
    @click.option("--fused_gn_swish", type=bool, default=False)
    @click.option("--profile_dir", type=str, default=None,
                  help="capture a jax.profiler trace of the measured steps")
    def run(batch, frames, res, ch, ch_mult, steps, dtype, remat, attn_chunk,
            attn_impl, fused_gn_swish, profile_dir, remat_policy,
            conv3d_impl, upsample_impl):
        import jax
        import numpy as np

        from vqgan_tpu.config import TrainConfig, TVAEConfig, parse_ch_mult
        from vqgan_tpu.train.trainer3d import Trainer3D, synthetic_video_batches

        tvae_cfg = TVAEConfig(
            resolution=res, ch=ch, ch_mult=parse_ch_mult(ch_mult),
            num_res_blocks=1, z_channels=8, compute_dtype=dtype, remat=remat,
            remat_policy=remat_policy, conv3d_impl=conv3d_impl,
            upsample_impl=upsample_impl,
            attn_chunk=attn_chunk, attn_impl=attn_impl,
            fused_gn_swish=fused_gn_swish,
        )
        cfg = TrainConfig(
            batch_size=batch, max_steps=steps, run_name="bench_tvae",
            use_wandb=False, ckpt_dir="/tmp/bench_tvae", log_every=10_000,
            mesh_shape="data=-1",
        )
        trainer = Trainer3D(cfg, tvae_cfg, frames=frames)
        src = synthetic_video_batches(batch, frames, res, seed=0)
        b = jax.device_put(next(src), trainer.batch_shard)

        def one_step():
            (
                trainer.params, trainer.opt_state, trainer.rng,
                trainer.vq_ema, m,
            ) = trainer._step(
                trainer.params, trainer.opt_state, b, trainer.rng,
                trainer.vq_ema,
            )
            return m

        for _ in range(2):  # warmup/compile
            m = one_step()
        float(m["loss"])  # host-fetch sync (block_until_ready is a no-op
        # through the axon tunnel — see CLAUDE.md)

        import contextlib

        prof = (
            jax.profiler.trace(profile_dir)
            if profile_dir
            else contextlib.nullcontext()
        )
        t0 = time.perf_counter()
        with prof:
            for _ in range(steps):
                m = one_step()
            loss = float(m["loss"])
        dt = time.perf_counter() - t0
        assert np.isfinite(loss), loss
        step_s = dt / steps
        print(
            json.dumps(
                {
                    "metric": "frames/sec/chip, 3D video VAE training",
                    "value": round(batch * frames * steps / dt, 3),
                    "unit": "frames/sec/chip",
                    "config": {
                        "batch": batch, "frames": frames, "res": res,
                        "ch": ch, "ch_mult": ch_mult, "dtype": dtype,
                    },
                    "step_seconds": round(step_s, 4),
                    "platform": jax.devices()[0].platform,
                }
            )
        )

    run()


if __name__ == "__main__":
    main()
