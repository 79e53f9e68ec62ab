#!/bin/bash
# Staged production launch (reference launcher.sh:9-24): recon-only warm
# start, then continue with GAN from the previous stage's checkpoint via
# --load_path.
set -euo pipefail
cd "$(dirname "$0")/.."

DATASET_URL="${DATASET_URL:-}"
CKPT_DIR="${CKPT_DIR:-./ckpt}"
# Trailing overrides (click: last occurrence of a flag wins) — used by the
# CI smoke (tests/test_recipe_scripts.py) to shrink the run.
EXTRA_FLAGS="${EXTRA_FLAGS:-}"

# Stage 1: recon-only
python -m vqgan_tpu.cli \
  --dataset_url "${DATASET_URL}" \
  --vae_ch 256 --vae_ch_mult 1,2,4,4 --vae_z_channels 16 \
  --batch_size 32 --learning_rate_vae 3e-3 \
  --max_steps 20000 --evaluate_every_n_steps 1000 \
  --do_clamp --clamp_th 8.0 \
  --ckpt_dir "${CKPT_DIR}" \
  --run_name stage1_recon \
  ${EXTRA_FLAGS}

# Stage 2: + GAN, continuing from stage 1 weights
LATEST=$(ls -t "${CKPT_DIR}"/stage1_recon/vae_*.pt | head -1)
python -m vqgan_tpu.cli \
  --dataset_url "${DATASET_URL}" \
  --vae_ch 256 --vae_ch_mult 1,2,4,4 --vae_z_channels 16 \
  --batch_size 32 --learning_rate_vae 1e-3 --learning_rate_disc 3e-5 \
  --do_ganloss --disc_type hinge --use_lecam true \
  --do_clamp --clamp_th 8.0 \
  --max_steps 100000 --evaluate_every_n_steps 1000 \
  --load_path "${LATEST}" \
  --ckpt_dir "${CKPT_DIR}" \
  --run_name stage2_gan \
  ${EXTRA_FLAGS}
