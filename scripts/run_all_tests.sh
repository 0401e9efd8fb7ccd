#!/bin/bash
# Full test suite + CLI smokes (the reference's run_all_tests.sh role).
#SBATCH --job-name=avsl_tests
#SBATCH --time=2:00:00
set -euo pipefail
cd "$(dirname "$0")/.."
make -C cpp/avsl_media
python -m pytest tests/ -q --junitxml=output/test_summary.xml
python bench.py
