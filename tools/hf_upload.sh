#!/bin/bash
# Publish a trained checkpoint to HuggingFace (reference tester_upload.sh:1-2).
# Exports the torch-format weights-only file — the interop format consumers
# of the reference's checkpoints (fal/AuraEquiVAE) expect.
set -euo pipefail
CKPT="${1:?usage: hf_upload.sh <checkpoint.pt> <repo_id>}"
REPO="${2:?usage: hf_upload.sh <checkpoint.pt> <repo_id>}"
huggingface-cli upload "${REPO}" "${CKPT}"
