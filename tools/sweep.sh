#!/bin/bash
# LR × width × attention sweep — the reference's grid (sweep.sh:3-28) on the
# TPU CLI. log2(lr) ∈ [-8,-2] × vae_ch ∈ {32,64,128} × attn ∈ {off,on},
# 2000 steps, global batch 32.
set -euo pipefail
cd "$(dirname "$0")/.."

DATASET_URL="${DATASET_URL:-}"
EXTRA_FLAGS="${EXTRA_FLAGS:-}"
# Grid axes overridable for CI smoke (tests/test_recipe_scripts.py runs one
# cell with LOG2LRS=-5 CHS=32 ATTNS=False).
LOG2LRS="${LOG2LRS:--8 -7 -6 -5 -4 -3 -2}"
CHS="${CHS:-32 64 128}"
ATTNS="${ATTNS:-False True}"

for log2lr in ${LOG2LRS}; do
  lr=$(python -c "print(2**($log2lr))")
  for ch in ${CHS}; do
    for attn in ${ATTNS}; do
      run_name="sweep_lr2e${log2lr}_ch${ch}_attn${attn}"
      echo "=== ${run_name}"
      python -m vqgan_tpu.cli \
        --dataset_url "${DATASET_URL}" \
        --learning_rate_vae "${lr}" \
        --vae_ch "${ch}" \
        --do_attn "${attn}" \
        --batch_size 32 \
        --max_steps 2000 \
        --evaluate_every_n_steps 500 \
        --run_name "${run_name}" \
        --project_name vae_sweep_attn_lr_width \
        ${EXTRA_FLAGS}
    done
  done
done
