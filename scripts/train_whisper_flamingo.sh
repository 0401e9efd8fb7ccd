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

# --- TPU env contract (see docs/ENGINEERING_NOTES.md) -------------------
# persistent XLA compile cache: directly-attached TPUs reuse it across
# runs (large-v2 compiles are minutes); harmless elsewhere
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$HOME/.cache/avsl_jax_cache}"
# donate/resume-friendly allocator: grab HBM up front, avoids fragmentation
export XLA_PYTHON_CLIENT_PREALLOCATE="${XLA_PYTHON_CLIENT_PREALLOCATE:-true}"
# fail fast on accidental host fallback (drop for CPU debugging runs)
export JAX_PLATFORMS="${JAX_PLATFORMS:-tpu,cpu}"
# keep HF/tokenizer lookups local (no egress on TPU pods)
export HF_HUB_OFFLINE="${HF_HUB_OFFLINE:-1}"
export TOKENIZERS_PARALLELISM=false

make -C cpp/avsl_media   # native media runtime
exec python -m avsl_tpu.cli.finetune "$CONFIG"
