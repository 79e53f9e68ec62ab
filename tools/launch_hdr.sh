#!/bin/bash
# Stage-4 HDR production recipe (reference scripts/launch_hdr.sh:3-30):
# ch=128, ch_mult 1,2,4,4,4, z=64, f16 wavelet encoder, HR decoder
# (512 out / 256 in), hinge + LeCam, lr 2^-7/ch, disc lr 3e-5, 100k steps.
set -euo pipefail
cd "$(dirname "$0")/.."

DATASET_URL="${DATASET_URL:-}"
# Trailing overrides (click: last occurrence of a flag wins) — used by the
# CI smoke (tests/test_recipe_scripts.py) to shrink the run.
EXTRA_FLAGS="${EXTRA_FLAGS:-}"
LOAD_PATH="${LOAD_PATH:-}"
LOAD_FLAG=""
[ -n "${LOAD_PATH}" ] && LOAD_FLAG="--load_path ${LOAD_PATH}"

python -m vqgan_tpu.cli \
  --dataset_url "${DATASET_URL}" \
  --vae_ch 128 --vae_ch_mult 1,2,4,4,4 --vae_z_channels 64 \
  --use_wavelet true \
  --decoder_also_perform_hr true \
  --batch_size 32 \
  --learning_rate_vae "$(python -c 'print(2**-7)')" \
  --learning_rate_disc 3e-5 \
  --do_ganloss --disc_type hinge --use_lecam true \
  --do_clamp --clamp_th 8.0 \
  --flip_invariance true --crop_invariance true \
  --max_steps 100000 --evaluate_every_n_steps 1000 \
  --run_name hdr_stage4 \
  ${LOAD_FLAG} \
  ${EXTRA_FLAGS}
