#!/bin/bash
# Evaluate a trained checkpoint (teacher-forced + beam WER).
set -euo pipefail
cd "$(dirname "$0")/.."
CONFIG="${1:-configs/ami_whisper_flamingo_large.yaml}"
CKPT="${2:-checkpoints/whisper_flamingo_ft/whisper-flamingo_large_ft_ami}"
exec python -m avsl_tpu.cli.evaluate --config "$CONFIG" --ckpt_dir "$CKPT" --beam 4
