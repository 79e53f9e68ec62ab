"""Configuration dataclasses for models and training.

The flag surface mirrors the reference CLI (vae_trainer.py:224-338) so that a
user of the reference can carry their launch scripts over; see cli.py for the
click bindings. Extra TPU-specific knobs (mesh shape, dtype policy, data
source honoring) are additive.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax.numpy as jnp

DTYPES = {
    "float32": jnp.float32,
    "fp32": jnp.float32,
    "bfloat16": jnp.bfloat16,
    "bf16": jnp.bfloat16,
}


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    """2D image VAE architecture config (reference ae.py:351-392).

    ``reg_type``:
      - "identity_gaussian": the reference's degenerate DiagonalGaussian with
        std=0.0 (ae.py:336-348) — deterministic.
      - "gaussian": real reparameterized Gaussian; encoder emits
        2*z_channels (mean, logvar), logvar clamped at -3 (tae.py:253-266).
      - "vq": vector-quantized latent with straight-through estimator —
        a declared capability target of the build (BASELINE.json config #4).
    """

    resolution: int = 256
    in_channels: int = 3
    ch: int = 256
    out_ch: int = 3
    ch_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 16
    use_attn: bool = False
    decoder_also_perform_hr: bool = False
    use_wavelet: bool = False
    reg_type: str = "identity_gaussian"
    # VQ options (used when reg_type == "vq")
    vq_codebook_size: int = 16384
    vq_beta: float = 0.25
    vq_ema_decay: float = 0.99  # 0 disables EMA codebook updates
    # dead-code revival: codes with EMA count below this are reseeded from
    # the current batch's encoder outputs each step (0 disables) — keeps
    # large codebooks utilized (PAPERS.md, 99%-utilization result)
    vq_revive_threshold: float = 0.0
    # dtype policy: the reference runs the encoder in fp32 (outside autocast,
    # vae_trainer.py:538) and the decoder in bf16 (vae_trainer.py:623);
    # GroupNorm always reduces in fp32 (ae.py:41-53).
    enc_dtype: str = "float32"
    dec_dtype: str = "bfloat16"
    # activation rematerialization at ResnetBlock granularity: trades ~1/3
    # extra forward FLOPs for O(depth) less activation memory — required to
    # fit large configs (e.g. the HDR 512px recipe) in a 16GB chip
    remat: bool = False
    # residual policy when remat is on: "full" = recompute everything inside
    # each block/level; "conv" = save conv outputs, recompute elementwise —
    # measured faster on HBM-bound steps (models/blocks.py::remat_with_policy)
    remat_policy: str = "full"
    # use the Pallas fused GroupNorm+swish kernel (ops/pallas/groupnorm.py)
    use_pallas_gn: bool = False
    # memory-efficient mid-block attention when H·W tokens exceed this
    # (Pallas flash kernel on TPU / exact lax chunk scan elsewhere,
    # ops/flash_attention.py) — for very-high-resolution use_attn configs
    # whose dense (H·W)² score matrix is the memory wall; 0 = dense (the
    # reference's behavior; token counts at ≤512px are tiny)
    attn_chunk: int = 0
    attn_impl: str = "auto"
    # decoder Upsample blocks: "direct" materializes the nearest-2x tensor
    # then 3x3-convs it (the reference's form, ae.py:157-167); "fused"
    # computes the identical function as subpixel phase convs
    # (ops/subpixel.py — no 4x activation write, 4 MACs/output px vs 9);
    # "dilated" computes it as ONE lhs-dilated conv (stride-2
    # transposed-conv form — same 4/9 MACs, output written directly, no
    # phase-interleave pass); "auto" = dilated on TPU, direct elsewhere.
    # MEASURED: fused moved the flagship 256px GAN bench 13.04 -> 13.67
    # img/s/chip (round 3); dilated is another 12-29% faster fwd+bwd at the
    # three flagship upsample shapes (BASELINE.md round 4) — default auto.
    upsample_impl: str = "auto"

    @property
    def ffactor(self) -> int:
        return 2 ** (len(self.ch_mult) - 1)

    @property
    def decoder_ch_mult(self) -> Tuple[int, ...]:
        # HR decode: one extra upsample level (reference ae.py:381).
        # Wavelet quirk: the reference Encoder mutates the *shared* ch_mult
        # list (ch_mult[0] *= 2, ae.py:194) before the Decoder is built from
        # it (ae.py:376-385), so wavelet mode doubles the decoder's level-0
        # width too — kept for checkpoint parity.
        mult = self.ch_mult
        if self.use_wavelet:
            mult = (mult[0] * 2,) + mult[1:]
        return mult + ((4,) if self.decoder_also_perform_hr else ())


@dataclasses.dataclass(frozen=True)
class TVAEConfig:
    """3D video VAE architecture config (reference tae.py:269-297)."""

    resolution: int = 256
    in_channels: int = 3
    ch: int = 64
    out_ch: int = 3
    ch_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 16
    reg_type: str = "gaussian"
    vq_codebook_size: int = 16384
    vq_beta: float = 0.25
    vq_ema_decay: float = 0.99
    # reseed codes whose EMA count falls below this from batch latents
    # (0 = off) — same dead-code revival as the 2D family (models/quant.py)
    vq_revive_threshold: float = 0.0
    compute_dtype: str = "bfloat16"
    # nested level+block rematerialization (the 2D family's memory scaling
    # strategy, models/ae.py): for the HBM-bound 3D step it is also a
    # THROUGHPUT lever — recompute is cheap when the MXU idles at ~20%
    # while saved-activation traffic saturates HBM (BASELINE.md)
    remat: bool = False
    # residual policy when remat is on: "full" recomputes everything inside
    # each block/level (memory-minimal); "conv" saves the conv outputs and
    # recomputes only the elementwise chains (norm/silu/add) — a lighter
    # recompute for the HBM-bound 3D step (models/tae.py::_remat)
    remat_policy: str = "full"
    # how to compute the 3x3x3 stride-1 convs: "auto" (tap2d on TPU,
    # direct elsewhere), "direct" (XLA Conv3d) or "tap2d" (three temporal
    # taps of batched 2D convs, same parameters and math —
    # models/tae.py::Conv3DTap2D; far better MXU tiling for the
    # narrow-channel video convs: +13% at 16f/128px, +103% at 48f/256px,
    # BASELINE.md "conv3d_impl")
    conv3d_impl: str = "auto"
    # mid-block attention over k/v chunks of this many tokens (exact
    # flash-style online softmax, ops/chunked_attention.py) instead of dense
    # SDPA — the single-chip answer to the O(N²) score matrix that OOMs
    # long clips (BASELINE.md). 0 = dense; ignored when the ring (context
    # axis) path is active or tokens ≤ chunk; a non-divisible token count is
    # an error (silent dense fallback would reintroduce the OOM).
    attn_chunk: int = 0
    # implementation of the chunked path: "auto" picks the Pallas TPU flash
    # kernel (ops/flash_attention.py) on a TPU backend and the portable lax
    # scan elsewhere; "pallas"/"lax" force one. jax.export artifacts always
    # use lax (a baked Pallas call would be TPU-only StableHLO).
    attn_impl: str = "auto"
    # decoder Upsample3D blocks: "direct" materializes the nearest-2x-3D
    # tensor then 3x3x3-convs it (reference tae.py:107-117); "fused" is the
    # identical function as subpixel phase convs (ops/subpixel.py — no 8x
    # activation write, 8 MACs/output voxel vs 27); "dilated" the identical
    # lhs-dilated conv; "auto" = dilated on TPU, direct elsewhere.
    # MEASURED (BASELINE.md r4, 16f/128px matrix): upsample impl is within
    # ±1% in the 3D family (its upsample convs are a small share of the
    # step) — auto adopted for the best measured combo (tap2dfat+dilated,
    # 246.3 f/s) and the 8/27 MAC cut at zero cost.
    upsample_impl: str = "auto"
    # fold the norm->silu chains into the GroupNorm op's elementwise sweep
    # (ops/normalization.py with_swish), as the 2D family does. MEASURED
    # (BASELINE.md round 3): neutral at the 48f/256px long-clip config and
    # ~2.6% SLOWER at 16f/128px (XLA already fuses the unfused silu into
    # neighboring ops; the custom-VJP boundary just constrains its fusion
    # choices) — default off for 3D, available as a knob.
    fused_gn_swish: bool = False


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training configuration; defaults match the reference CLI defaults
    (vae_trainer.py:224-338)."""

    # data
    dataset_url: str = ""
    test_dataset_url: str = ""
    batch_size: int = 8  # GLOBAL batch (reference: per-process batch × world)
    num_epochs: int = 2
    image_size: int = 512  # loaded resolution (MAX_WIDTH, vae_trainer.py:93)
    num_workers: int = 4
    synthetic_data: bool = False  # deterministic on-host generated batches
    # indexed data mode (data/indexed.py): per-epoch perfect shuffle and
    # sample-exact resume — batch at step S is the same on every run/restart.
    # DEFAULT for training runs (round 3): every supported source is a local
    # tar file, where position-addressed reads are safe; streaming mode
    # (False) remains for sequential-only media, with reseed-based resume.
    indexed_data: bool = True
    # ship uint8 batches to device and normalize there (4x less H2D traffic;
    # bit-identical to host normalization — trace-time dtype branch)
    device_normalize: bool = True

    # optimization (vae_trainer.py:455-490)
    learning_rate_vae: float = 1e-5  # divided by vae_ch (muP-style) for all
    learning_rate_disc: float = 2e-4  # but conv_in, which gets fixed 1e-4
    weight_decay: float = 1e-3
    beta1: float = 0.9
    beta2: float = 0.95
    warmup_steps: int = 200
    max_steps: int = 1000
    # process the global batch in this many sequential microbatches per
    # optimizer step (train/step.py::step_accum): the effective batch can
    # exceed HBM — e.g. the reference's 8-GPU HDR recipe at its full
    # effective batch of 32 on one 16 GB chip. 1 = off.
    grad_accum: int = 1
    # exponential moving average of the generator weights (Polyak
    # averaging) — standard production practice for VAE/GAN quality; the
    # reference has no equivalent. 0 = off (reference behavior). When on,
    # eval/checkpoint-export score and ship the EMA weights
    # (state.g_ema), while training continues on the raw ones.
    ema_decay: float = 0.0

    # objectives
    do_ganloss: bool = False
    disc_type: str = "bce"  # "bce" | "hinge" (vae_trainer.py:63-90)
    use_lecam: bool = False
    lecam_weight: float = 0.1  # vae_trainer.py:519
    lecam_beta: float = 0.9  # vae_trainer.py:522
    # loss weights: the reference hardcodes recon*0.0 + 0.1*z² inside
    # vae_loss_function (vae_trainer.py:209); we expose them as flags and
    # keep the reference values as defaults.
    recon_weight: float = 0.0
    z_reg_weight: float = 0.1
    do_pool_recon: bool = True
    gradnorm_lpips: float = 1.0  # vae_trainer.py:662
    gradnorm_mse: float = 0.001  # vae_trainer.py:679
    gradnorm_gan: float = 1.0  # vae_trainer.py:683
    # "global": normalize each branch by the global Frobenius norm (√N
    # smaller than the reference's convention for N data shards; constant
    # folds into the lr). "mean_shard_norm": mean of per-data-shard norms —
    # the reference's exact per-rank semantics (vae_trainer.py:40-44),
    # matching its loss curves chip-count-for-GPU-count (ops/gradnorm.py).
    gradnorm_mode: str = "global"
    augment_before_perceptual_loss: bool = False
    lpips_weights: Optional[str] = None  # path to converted LPIPS weights
    # pretrained VGG16 backbone for the PatchDiscriminator (reference
    # utils.py:147-156 starts from torchvision pretrained weights);
    # tools/fetch_lpips.py produces the file where egress exists
    disc_backbone_weights: Optional[str] = None
    # video (train3d) GAN/LPIPS stack: number of frames per clip fed to the
    # per-frame perceptual + discriminator branches (strided subset with a
    # traced random phase, train/step3d.py). 0 = every frame. The L2 branch
    # always sees all frames.
    video_loss_frames: int = 0
    # video discriminator: "frame" = the 2D PatchDiscriminator on each frame
    # (reference-style); "tubelet" = TubeletDiscriminator — same VGG backbone
    # per frame + identity-init depthwise temporal mixers before the patch
    # heads, so the multi-scale vote also judges short-range motion
    # coherence (losses/discriminator.py; beyond the reference, which never
    # trains its video model)
    disc_3d: str = "frame"

    # latent behaviors (vae_trainer.py:561-621)
    do_clamp: bool = False
    clamp_th: float = 8.0
    flip_invariance: bool = False
    crop_invariance: bool = False
    downscale_factor: int = 16
    # jit-friendly redesign of the reference's random-size latent crop
    # (vae_trainer.py:577-621): a small set of static crop sizes (fractions
    # of the latent side) — one compiled step variant per bucket, selected
    # host-side — with random offsets traced per step. Buckets approximate
    # the reference's random-size distribution without dynamic shapes.
    # Bucket 1 first so the legacy boolean do_crop=True (== bucket 1) keeps
    # the pre-bucketing 0.75 behavior.
    crop_fractions: Tuple[float, ...] = (0.75, 0.5, 0.875)

    # run management
    run_name: str = "run"
    project_name: str = "vae_sweep_attn_lr_width"
    evaluate_every_n_steps: int = 250
    eval_batches: int = 2  # reference scores exactly 2 test batches (:860)
    # the reference evaluates under bf16 autocast (encoder AND decoder,
    # vae_trainer.py:821,841) even when training the encoder in fp32 —
    # matched by default; set False to evaluate in the training dtypes
    eval_bf16: bool = True
    # larger values tighten eval/lpips and especially the Fréchet rFID proxy
    # VGG tap activations pooled into the Fréchet rFID proxy's feature
    # vector (losses/fid.py::make_feature_fn). (-1,) is the relu5_3-only
    # statistic. MEASURED (BASELINE.md round 4): multi-tap (2, 3, 4) does
    # NOT fix the small-eval-set artifact (the Fréchet fit rising while
    # LPIPS improves on the 32-image toy eval — both tap sets rise ~10x);
    # the lever is --eval_batches, not tap depth. Default stays (-1,) for
    # comparability with earlier runs; the knob remains for studies.
    rfid_taps: Tuple[int, ...] = (-1,)
    load_path: Optional[str] = None
    ckpt_dir: str = "./ckpt"
    seed: int = 42
    log_every: int = 5  # vae_trainer.py:713
    use_wandb: bool = True  # falls back to JSONL logger when wandb is absent

    # NaN/divergence sanitizer (SURVEY.md §5): verified on every metric fetch
    # and immediately before every checkpoint, halting instead of silently
    # checkpointing over the last good state
    nan_guard: bool = True

    # TPU/mesh
    mesh_shape: str = "data=-1"  # e.g. "data=4,fsdp=2" ; -1 = fill devices
    full_bf16: bool = False  # run encoder in bf16 too (perf mode)
    profile_dir: Optional[str] = None  # jax.profiler trace output


def parse_ch_mult(s: str | Sequence[int]) -> Tuple[int, ...]:
    """Parse the reference's comma-string ch_mult flag (vae_trainer.py:427)."""
    if isinstance(s, str):
        return tuple(int(x) for x in s.split(","))
    return tuple(int(x) for x in s)


def parse_mesh_shape(s: str) -> dict:
    """Parse "data=4,fsdp=2,tensor=1" into an ordered axis dict."""
    out = {}
    for part in s.split(","):
        if not part:
            continue
        k, v = part.split("=")
        out[k.strip()] = int(v)
    return out
