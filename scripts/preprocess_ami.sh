#!/bin/bash
# Full AMI preprocessing: annotations -> segments -> lip clips -> HF dataset.
#SBATCH --job-name=ami_preprocess
#SBATCH --time=48:00:00
#SBATCH --cpus-per-task=16
set -euo pipefail
cd "$(dirname "$0")/.."
AMI_ROOT="${1:?usage: preprocess_ami.sh <ami_root> <out_dir>}"
OUT="${2:?}"
make -C cpp/avsl_media
python -m avsl_tpu.cli.preprocess transcripts --input "$AMI_ROOT/transcripts" --output "$OUT/transcript_segments"
python -m avsl_tpu.cli.preprocess markers --input "$AMI_ROOT/transcripts" \
  --output "$OUT/markers" \
  --disfluency_dir "$AMI_ROOT/transcripts/disfluency" \
  --dsfl_types "$AMI_ROOT/transcripts/ontologies/dsfl-types.xml"
python -m avsl_tpu.cli.preprocess dialogue_acts --input "$AMI_ROOT/transcripts" \
  --output "$OUT/dialogue_acts" \
  --da_types "$AMI_ROOT/transcripts/ontologies/da-types.xml" \
  --ap_types "$AMI_ROOT/transcripts/ontologies/ap-types.xml"
python -m avsl_tpu.cli.preprocess segment --transcripts "$OUT/transcript_segments" \
  --media_dir "$AMI_ROOT/media" --output "$OUT/ami_clean"
