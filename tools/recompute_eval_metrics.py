"""Recompute eval PSNR/SSIM offline from a run's saved .pt checkpoints.

Why this exists: the round-4 flagship quality run (BASELINE.md) logged
eval/ssim through the pre-fix ``losses/metrics.py::ssim`` whose window
convs ran at the TPU's DEFAULT (bf16) conv precision — the variance
cancellation blew the SSIM map out of [-1, 1]. The checkpoints are fine;
this tool replays the run's exact eval contract (same cached first-N test
batches, same ``make_eval_step`` bf16-autocast decode) against each saved
checkpoint and prints one JSON line per step with corrected PSNR/SSIM.

Usage (defaults match the flagship_quality_r04 run):
    python tools/recompute_eval_metrics.py \
        --ckpt_glob 'ckpt/flagship_quality_r04/vae_epoch_0_step_*.pt' \
        --test_dataset_url '/tmp/vqgan_bench_data/00003.tar'
"""

from __future__ import annotations

import dataclasses
import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import click
import jax.numpy as jnp
import numpy as np

from vqgan_tpu.config import TrainConfig, VAEConfig
from vqgan_tpu.data.loader import create_dataloader
from vqgan_tpu.losses.metrics import psnr, ssim
from vqgan_tpu.models.ae import VAE
from vqgan_tpu.train.checkpoint import load_weights
from vqgan_tpu.train.evaluate import make_eval_step


@click.command()
@click.option("--ckpt_glob", required=True)
@click.option("--test_dataset_url", required=True)
@click.option("--batch_size", default=16)
@click.option("--eval_batches", default=2)
@click.option("--image_size", default=256)
@click.option("--vae_ch", default=256)
@click.option("--vae_ch_mult", default="1,2,4,4")
@click.option("--vae_z_channels", default=16)
@click.option("--vae_resolution", default=256)
@click.option("--seed", default=42)
@click.option("--judge_lpips", default=None,
              help="Also score eval/lpips_judge under FIXED judge net(s): "
                   "'default' = the deterministic seed-42 random-VGG every "
                   "run without --lpips_weights trains against, or a path "
                   "to converted weights (.npz/.pth). Comma-separate several "
                   "(e.g. 'default,/tmp/alt.npz') to score all judges in one "
                   "pass — checkpoint loads dominate, so N judges cost ~the "
                   "same as one. Lets checkpoints of runs trained with "
                   "DIFFERENT perceptual nets be compared on one scale "
                   "(the r5 proxy-variance study).")
def main(
    ckpt_glob,
    test_dataset_url,
    batch_size,
    eval_batches,
    image_size,
    vae_ch,
    vae_ch_mult,
    vae_z_channels,
    vae_resolution,
    seed,
    judge_lpips,
):
    cfg = TrainConfig(
        run_name="recompute",
        dataset_url=test_dataset_url,
        test_dataset_url=test_dataset_url,
        batch_size=batch_size,
        eval_batches=eval_batches,
        image_size=image_size,
        seed=seed,
    )
    vae_cfg = VAEConfig(
        ch=vae_ch,
        ch_mult=tuple(int(x) for x in vae_ch_mult.split(",")),
        z_channels=vae_z_channels,
        resolution=vae_resolution,
    )
    model = VAE(cfg=vae_cfg)
    eval_step = make_eval_step(cfg, vae_cfg, model)

    # the trainer's fixed eval set: first N batches of the just-resize test
    # stream at the base seed (trainer.py::_make_loader, train=False)
    loader = iter(
        create_dataloader(
            test_dataset_url,
            batch_size,
            num_workers=2,
            do_shuffle=False,
            just_resize=True,
            width=image_size,
            seed=seed,
            device_normalize=cfg.device_normalize,
            indexed=False,
        )
    )
    batches = [jnp.asarray(next(loader)) for _ in range(eval_batches)]

    judges = {}
    if judge_lpips:
        import jax

        from vqgan_tpu.losses.lpips import LPIPS, load_lpips_params

        # "default" reproduces the net a --lpips_weights-less run trains
        # against: k_lpips is the 3rd split of the root seed (trainer.py:89)
        _, _, k_lpips, _ = jax.random.split(jax.random.PRNGKey(seed), 4)
        judge_model = LPIPS()  # fp32 judge for metric stability
        for spec in judge_lpips.split(","):
            spec = spec.strip()
            path = None if spec == "default" else spec
            judge_params = load_lpips_params(path, k_lpips, image_size=vae_resolution)
            name = (
                "default"
                if path is None
                else os.path.splitext(os.path.basename(path))[0]
            )

            def judge_fn(a, b, _p=judge_params):
                return judge_model.apply({"params": _p}, a, b).mean()

            judges[name] = jax.jit(judge_fn)

    paths = sorted(
        glob.glob(ckpt_glob),
        key=lambda p: int(re.search(r"step_(\d+)", p).group(1)),
    )
    if not paths:
        raise SystemExit(f"no checkpoints match {ckpt_glob}")
    for path in paths:
        step = int(re.search(r"step_(\d+)", path).group(1))
        params = load_weights(path)
        recons, targets = [], []
        for batch in batches:
            r, t = eval_step(params, None, batch)
            recons.append(np.asarray(r))
            targets.append(np.asarray(t))
        recon = jnp.asarray(np.concatenate(recons))
        target = jnp.asarray(np.concatenate(targets))
        rec = {
            "step": step,
            "eval/psnr": float(psnr(recon, target)),
            "eval/ssim": float(ssim(recon, target)),
        }
        for name, judge in judges.items():
            key = (
                "eval/lpips_judge"
                if len(judges) == 1 and name == "default"
                else f"eval/lpips_judge_{name}"
            )
            rec[key] = float(judge(recon * 2.0 - 1.0, target * 2.0 - 1.0))
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
