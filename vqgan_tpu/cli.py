"""CLI — the reference's full flag surface (vae_trainer.py:224-338), same
names and defaults, plus TPU-specific additions (mesh shape, dtype policy,
synthetic data, reg type, wandb toggle).

Launch:  python -m vqgan_tpu.cli [flags]
(vs the reference's `torchrun --nproc_per_node=8 vae_trainer.py` — process
management is JAX's: one process per host, all chips of the host driven by
one process.)

Deviations from the reference, by design (SURVEY.md §7 "quirks"):
  - --dataset_url / --test_dataset_url are honored (the reference overwrites
    them with hardcoded paths, vae_trainer.py:380-387),
  - batch_size is the GLOBAL batch, split across hosts,
  - generator gradients are correctly averaged across chips (the reference's
    generator forward bypasses DDP and never syncs generator grads).
"""

from __future__ import annotations

import os

# Platform override for CPU smoke runs (the axon sitecustomize in some
# images force-registers the TPU backend regardless of JAX_PLATFORMS):
#   VQGAN_TPU_PLATFORM=cpu VQGAN_TPU_HOST_DEVICES=8 python -m vqgan_tpu.cli ...
if os.environ.get("VQGAN_TPU_HOST_DEVICES"):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={os.environ['VQGAN_TPU_HOST_DEVICES']}"
    )
if os.environ.get("VQGAN_TPU_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["VQGAN_TPU_PLATFORM"])

import click

from vqgan_tpu.config import TrainConfig, VAEConfig, parse_ch_mult


@click.command()
@click.option("--dataset_url", type=str, default="", help="URL for the training dataset")
@click.option("--test_dataset_url", type=str, default="", help="URL for the test dataset")
@click.option("--num_epochs", type=int, default=2, help="Number of training epochs")
@click.option("--batch_size", type=int, default=8, help="GLOBAL batch size for training")
@click.option("--do_ganloss", is_flag=True, help="Whether to use GAN loss")
@click.option("--learning_rate_vae", type=float, default=1e-5, help="Learning rate for VAE")
@click.option("--learning_rate_disc", type=float, default=2e-4, help="Learning rate for discriminator")
@click.option("--vae_resolution", type=int, default=256, help="Resolution for VAE")
@click.option("--vae_in_channels", type=int, default=3, help="Input channels for VAE")
@click.option("--vae_ch", type=int, default=256, help="Base channel size for VAE")
@click.option("--vae_ch_mult", type=str, default="1,2,4,4", help="Channel multipliers for VAE")
@click.option("--vae_num_res_blocks", type=int, default=2, help="Number of residual blocks for VAE")
@click.option("--vae_z_channels", type=int, default=16, help="Number of latent channels for VAE")
@click.option("--run_name", type=str, default="run", help="Name of the run")
@click.option("--max_steps", type=int, default=1000, help="Maximum number of steps to train for")
@click.option("--evaluate_every_n_steps", type=int, default=250, help="Evaluate every n steps")
@click.option("--load_path", type=str, default=None, help="Path to load the model from (torch .pt or orbax dir)")
@click.option("--do_clamp", is_flag=True, help="Whether to clamp the latent codes")
@click.option("--clamp_th", type=float, default=8.0, help="Clamp threshold for the latent codes")
@click.option("--max_spatial_dim", type=int, default=256, help="Maximum spatial dimension for overall training")
@click.option("--do_attn", type=bool, default=False, help="Whether to use attention in the VAE")
@click.option("--decoder_also_perform_hr", type=bool, default=False, help="Whether to perform HR decoding in the decoder")
@click.option("--project_name", type=str, default="vae_sweep_attn_lr_width", help="Project name for logging")
@click.option("--crop_invariance", type=bool, default=False, help="Whether to perform crop invariance")
@click.option("--flip_invariance", type=bool, default=False, help="Whether to perform flip invariance")
@click.option("--do_compile", type=bool, default=True, help="Kept for flag parity; everything is jit-compiled on TPU")
@click.option("--use_wavelet", type=bool, default=False, help="Whether to use wavelet transform in the encoder")
@click.option("--augment_before_perceptual_loss", type=bool, default=False, help="Whether to augment the images before the perceptual loss")
@click.option("--downscale_factor", type=int, default=16, help="Downscale factor for the latent space")
@click.option("--use_lecam", type=bool, default=False, help="Whether to use LeCam regularization")
@click.option("--disc_type", type=str, default="bce", help="Discriminator type: bce | hinge")
# --- TPU-native additions ---
@click.option("--recon_weight", type=float, default=0.0, help="Reconstruction loss weight (the reference hardcodes 0.0, vae_trainer.py:209)")
@click.option("--z_reg_weight", type=float, default=0.1, help="z^2 latent penalty weight (reference 0.1)")
@click.option("--do_pool_recon", type=bool, default=True, help="True: pooled L1 recon; False: blurriness-heatmap-masked L1")
@click.option("--reg_type", type=str, default="identity_gaussian", help="Latent regularizer: identity_gaussian | gaussian | vq")
@click.option("--vq_codebook_size", type=int, default=16384, help="VQ codebook size (reg_type=vq)")
@click.option("--vq_revive_threshold", type=float, default=0.0, help="Reseed codes with EMA count below this from batch samples (0=off)")
@click.option("--mesh_shape", type=str, default="data=-1", help="Device mesh, e.g. data=4,fsdp=2,tensor=1")
@click.option("--remat", type=bool, default=False, help="Activation rematerialization (fit large configs in HBM)")
@click.option("--remat_policy", type=str, default="full",
              help="Remat residual policy: full (recompute everything) | "
                   "conv (save conv outputs, recompute elementwise only)")
@click.option("--use_pallas_gn", type=bool, default=False, help="Use the Pallas fused GroupNorm+swish kernel")
@click.option("--attn_chunk", type=int, default=0,
              help="Memory-efficient mid-block attention once H*W tokens "
                   "exceed this (0 = dense; for very-high-res --do_attn)")
@click.option("--attn_impl", type=str, default="auto",
              help="auto (Pallas flash on TPU, lax elsewhere) | pallas | lax")
@click.option("--upsample_impl", type=str, default="auto",
              help="Decoder Upsample blocks: direct (nearest-2x then conv) "
                   "| fused (identical subpixel phase convs) | dilated "
                   "(identical lhs-dilated conv, ops/subpixel.py) | auto "
                   "(dilated on TPU — flagship 13.0 -> 14.8 img/s/chip)")
@click.option("--full_bf16", type=bool, default=False, help="Run the encoder in bf16 too (perf mode)")
@click.option("--gradnorm_mode", type=str, default="global",
              help="global = Frobenius norm of the global cotangent; "
                   "mean_shard_norm = reference per-rank norm averaging "
                   "(vae_trainer.py:40-44) for curve parity at world size N")
@click.option("--synthetic_data", type=bool, default=False, help="Use the deterministic synthetic data source")
@click.option("--indexed_data", type=bool, default=True, help="Position-addressed tar dataset (default): perfect per-epoch shuffle + sample-exact resume; false = streaming reader (sequential reads, reseed-based resume)")
@click.option("--image_size", type=int, default=512, help="Loaded image resolution (reference MAX_WIDTH)")
@click.option("--num_workers", type=int, default=4, help="Decode workers per host")
@click.option("--device_normalize", type=bool, default=True, help="Ship uint8 batches; normalize on device (4x less H2D)")
@click.option("--use_wandb", type=bool, default=True, help="Log to wandb when available (JSONL fallback otherwise)")
@click.option("--lpips_weights", type=str, default=None, help="Path to converted LPIPS weights (.pth or .npz)")
@click.option("--disc_backbone_weights", type=str, default=None,
              help="Pretrained VGG16 backbone for the discriminator "
                   "(tools/fetch_lpips.py vgg16_features.npz or a .pth)")
@click.option("--ckpt_dir", type=str, default="./ckpt", help="Checkpoint root directory")
@click.option("--profile_dir", type=str, default=None, help="Write a jax.profiler trace of steps 10-15 here")
@click.option("--seed", type=int, default=42, help="Seed (reference seeds everything to 42)")
@click.option("--log_every", type=int, default=5, help="Metric logging cadence in steps (reference logs every 5)")
@click.option("--eval_batches", type=int, default=2, help="Test batches per eval (reference: 2); raise for tighter rFID")
@click.option("--nan_guard", type=bool, default=True, help="Halt (without checkpointing) on non-finite loss")
@click.option("--ema_decay", type=float, default=0.0,
              help="Polyak EMA of generator weights (e.g. 0.999); eval and a "
                   "*_ema.pt artifact use the averaged weights. 0 = off "
                   "(reference behavior)")
@click.option("--grad_accum", type=int, default=1,
              help="Microbatches per optimizer step: effective batches "
                   "beyond HBM (D updates before G sees it, as one big step)")
def train(**kw):
    """Train the 2D image VAE (optionally GAN) — TPU-native train_ddp."""
    vae_cfg = VAEConfig(
        resolution=kw["vae_resolution"],
        in_channels=kw["vae_in_channels"],
        ch=kw["vae_ch"],
        out_ch=kw["vae_in_channels"],
        ch_mult=parse_ch_mult(kw["vae_ch_mult"]),
        num_res_blocks=kw["vae_num_res_blocks"],
        z_channels=kw["vae_z_channels"],
        use_attn=kw["do_attn"],
        decoder_also_perform_hr=kw["decoder_also_perform_hr"],
        use_wavelet=kw["use_wavelet"],
        reg_type=kw["reg_type"],
        vq_codebook_size=kw["vq_codebook_size"],
        vq_revive_threshold=kw["vq_revive_threshold"],
        remat=kw["remat"],
        remat_policy=kw["remat_policy"],
        use_pallas_gn=kw["use_pallas_gn"],
        attn_chunk=kw["attn_chunk"],
        attn_impl=kw["attn_impl"],
        upsample_impl=kw["upsample_impl"],
    )
    cfg = TrainConfig(
        dataset_url=kw["dataset_url"],
        test_dataset_url=kw["test_dataset_url"],
        batch_size=kw["batch_size"],
        num_epochs=kw["num_epochs"],
        image_size=kw["image_size"],
        num_workers=kw["num_workers"],
        device_normalize=kw["device_normalize"],
        synthetic_data=kw["synthetic_data"],
        indexed_data=kw["indexed_data"],
        learning_rate_vae=kw["learning_rate_vae"],
        learning_rate_disc=kw["learning_rate_disc"],
        max_steps=kw["max_steps"],
        do_ganloss=kw["do_ganloss"],
        disc_type=kw["disc_type"],
        use_lecam=kw["use_lecam"],
        recon_weight=kw["recon_weight"],
        z_reg_weight=kw["z_reg_weight"],
        do_pool_recon=kw["do_pool_recon"],
        augment_before_perceptual_loss=kw["augment_before_perceptual_loss"],
        lpips_weights=kw["lpips_weights"],
        disc_backbone_weights=kw["disc_backbone_weights"],
        do_clamp=kw["do_clamp"],
        clamp_th=kw["clamp_th"],
        flip_invariance=kw["flip_invariance"],
        crop_invariance=kw["crop_invariance"],
        downscale_factor=kw["downscale_factor"],
        run_name=kw["run_name"],
        project_name=kw["project_name"],
        evaluate_every_n_steps=kw["evaluate_every_n_steps"],
        load_path=kw["load_path"],
        ckpt_dir=kw["ckpt_dir"],
        seed=kw["seed"],
        log_every=kw["log_every"],
        eval_batches=kw["eval_batches"],
        nan_guard=kw["nan_guard"],
        ema_decay=kw["ema_decay"],
        grad_accum=kw["grad_accum"],
        use_wandb=kw["use_wandb"],
        mesh_shape=kw["mesh_shape"],
        full_bf16=kw["full_bf16"],
        gradnorm_mode=kw["gradnorm_mode"],
        profile_dir=kw["profile_dir"],
    )
    from vqgan_tpu.train.trainer import Trainer

    Trainer(cfg, vae_cfg).train()


@click.command()
@click.option("--dataset_url", type=str, default="",
              help="Tar shards of .npy/.npz uint8 (T,H,W,3) clip samples "
                   "(brace ranges OK); empty = synthetic moving-pattern clips")
@click.option("--test_dataset_url", type=str, default="",
              help="Held-out clip shards for eval (defaults to dataset_url)")
@click.option("--num_workers", type=int, default=4)
@click.option("--batch_size", type=int, default=4)
@click.option("--vae_ch", type=int, default=64)
@click.option("--vae_ch_mult", type=str, default="1,2,4,4")
@click.option("--vae_num_res_blocks", type=int, default=2)
@click.option("--vae_z_channels", type=int, default=16)
@click.option("--vae_resolution", type=int, default=64)
@click.option("--frames", type=int, default=8, help="Clip length T")
@click.option("--reg_type", type=str, default="gaussian", help="gaussian | vq")
@click.option("--vq_codebook_size", type=int, default=16384,
              help="VQ codebook size (reg_type=vq)")
@click.option("--vq_ema_decay", type=float, default=0.99,
              help="EMA codebook update decay (reg_type=vq; 0 = loss-based "
                   "codebook training)")
@click.option("--vq_revive_threshold", type=float, default=0.0,
              help="Reseed codes with EMA count below this from batch "
                   "latents (0=off)")
@click.option("--remat", type=bool, default=False,
              help="Level+block rematerialization (memory for long clips)")
@click.option("--remat_policy", type=str, default="full",
              help="Remat residual policy: full (recompute everything) | "
                   "conv (save conv outputs, recompute elementwise only)")
@click.option("--conv3d_impl", type=str, default="auto",
              help="3x3x3 conv compute: auto (tap2dfat on TPU) | direct "
                   "(XLA Conv3d) | tap2d (temporal-tap batched 2D convs, "
                   "same params/math — measured best at 48f/256px) | "
                   "tap2dfat (one 3*Co-wide 2D conv) | pallas (fused-tap "
                   "kernel) | mixed (pallas at >=128-channel convs, "
                   "tap2dfat below — per-level isolated best; loses ~3% "
                   "end-to-end to tap2dfat, BASELINE r5)")
@click.option("--attn_chunk", type=int, default=0,
              help="Exact chunked mid-block attention over this many k/v "
                   "tokens (0 = dense) — single-chip long clips whose "
                   "dense score matrix exceeds HBM")
@click.option("--attn_impl", type=str, default="auto",
              help="Chunked-attention impl: auto (Pallas flash kernel on "
                   "TPU, lax scan elsewhere) | pallas | lax")
@click.option("--upsample_impl", type=str, default="auto",
              help="Decoder Upsample3D blocks: direct (nearest-2x-3D then "
                   "Conv3d) | fused (identical subpixel phase convs) | "
                   "dilated (identical lhs-dilated conv, ops/subpixel.py) "
                   "| auto (dilated on TPU; all within ±1% at 16f/128px)")
@click.option("--fused_gn_swish", type=bool, default=False,
              help="Fold norm->silu into the GroupNorm sweep (perf knob; "
                   "numerics unchanged)")
@click.option("--learning_rate_vae", type=float, default=1e-2)
@click.option("--do_ganloss", type=bool, default=False,
              help="Full per-frame GAN/LPIPS stack (PatchDiscriminator + "
                   "LPIPS + GradNorm branches + LeCam) — the 2D trainer's "
                   "loss stack applied to video (train/step3d.py)")
@click.option("--disc_type", type=str, default="bce", help="bce | hinge")
@click.option("--use_lecam", type=bool, default=False)
@click.option("--learning_rate_disc", type=float, default=2e-4)
@click.option("--video_loss_frames", type=int, default=0,
              help="Frames per clip fed to the perceptual/GAN branches "
                   "(strided subset, random phase; 0 = all frames)")
@click.option("--disc_3d", type=str, default="frame",
              help="Video discriminator: frame (2D patch disc per frame) | "
                   "tubelet (spatio-temporal: + identity-init depthwise "
                   "temporal mixers before the patch heads)")
@click.option("--ema_decay", type=float, default=0.0,
              help="Polyak EMA of generator weights (GAN path); eval scores "
                   "the averaged weights. 0 = off")
@click.option("--grad_accum", type=int, default=1,
              help="Microbatches per optimizer step: effective clip batches "
                   "beyond HBM (D updates before G sees it, as one big step)")
@click.option("--max_steps", type=int, default=1000)
@click.option("--run_name", type=str, default="tvae_run")
@click.option("--mesh_shape", type=str, default="data=-1")
@click.option("--use_wandb", type=bool, default=True)
@click.option("--log_every", type=int, default=5)
@click.option("--eval_batches", type=int, default=2)
@click.option("--evaluate_every_n_steps", type=int, default=250,
              help="Checkpoint cadence (0 = final save only)")
@click.option("--ckpt_dir", type=str, default="./ckpt")
@click.option("--load_path", type=str, default=None,
              help="Weights to start from (orbax dir); otherwise the run "
                   "dir's latest full state auto-resumes")
@click.option("--seed", type=int, default=42)
def train3d(**kw):
    """Train the 3D video VAE (TVAE, reference tae.py) — the video-model
    capability the reference declares but never wires. Data: tar shards of
    .npy/.npz clips via --dataset_url, or synthetic moving patterns."""
    from vqgan_tpu.config import TVAEConfig
    from vqgan_tpu.train.trainer3d import Trainer3D

    tvae_cfg = TVAEConfig(
        resolution=kw["vae_resolution"],
        ch=kw["vae_ch"],
        ch_mult=parse_ch_mult(kw["vae_ch_mult"]),
        num_res_blocks=kw["vae_num_res_blocks"],
        z_channels=kw["vae_z_channels"],
        reg_type=kw["reg_type"],
        vq_codebook_size=kw["vq_codebook_size"],
        vq_ema_decay=kw["vq_ema_decay"],
        vq_revive_threshold=kw["vq_revive_threshold"],
        remat=kw["remat"],
        remat_policy=kw["remat_policy"],
        conv3d_impl=kw["conv3d_impl"],
        attn_chunk=kw["attn_chunk"],
        attn_impl=kw["attn_impl"],
        upsample_impl=kw["upsample_impl"],
        fused_gn_swish=kw["fused_gn_swish"],
    )
    cfg = TrainConfig(
        batch_size=kw["batch_size"],
        dataset_url=kw["dataset_url"],
        test_dataset_url=kw["test_dataset_url"],
        synthetic_data=not kw["dataset_url"],
        num_workers=kw["num_workers"],
        learning_rate_vae=kw["learning_rate_vae"],
        do_ganloss=kw["do_ganloss"],
        disc_type=kw["disc_type"],
        use_lecam=kw["use_lecam"],
        learning_rate_disc=kw["learning_rate_disc"],
        video_loss_frames=kw["video_loss_frames"],
        disc_3d=kw["disc_3d"],
        ema_decay=kw["ema_decay"],
        grad_accum=kw["grad_accum"],
        max_steps=kw["max_steps"],
        run_name=kw["run_name"],
        mesh_shape=kw["mesh_shape"],
        use_wandb=kw["use_wandb"],
        log_every=kw["log_every"],
        eval_batches=kw["eval_batches"],
        evaluate_every_n_steps=kw["evaluate_every_n_steps"],
        ckpt_dir=kw["ckpt_dir"],
        load_path=kw["load_path"],
        seed=kw["seed"],
    )
    Trainer3D(cfg, tvae_cfg, frames=kw["frames"]).train()


@click.group()
def cli():
    pass


cli.add_command(train)
cli.add_command(train3d)


if __name__ == "__main__":
    import sys

    # `python -m vqgan_tpu.cli [flags]` keeps the reference's single-command
    # feel (defaults to `train`); `... train3d [flags]` selects the 3D path.
    if len(sys.argv) > 1 and sys.argv[1] in ("train", "train3d"):
        cli()
    else:
        train()
