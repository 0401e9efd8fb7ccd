#!/bin/bash
# Whisper-Flamingo fine-tuning launcher (TPU).
# SLURM-compatible: submit with `sbatch scripts/train_whisper_flamingo.sh`
# or run directly. The reference's equivalent is
# avsl/scripts/train/whisper_flamingo_ft.sh (1xA100); here one v5e host.
#SBATCH --job-name=whisper_flamingo_ft
#SBATCH --time=24:00:00
#SBATCH --cpus-per-task=32
#SBATCH --mem=100G
set -euo pipefail
cd "$(dirname "$0")/.."
CONFIG="${1:-configs/ami_whisper_flamingo_large.yaml}"
make -C cpp/avsl_media   # native media runtime
exec python -m avsl_tpu.cli.finetune "$CONFIG"
