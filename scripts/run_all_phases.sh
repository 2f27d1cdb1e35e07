#!/usr/bin/env bash
# Sequential phase pipeline: step 1 -> 2 -> 3 -> 5 -> 6, each chaining the
# previous phase's best checkpoint (reference utils.py:95-128 weight_loader),
# then step 4 test evaluation.
set -euo pipefail
cd "$(dirname "$0")/.."
COMMON=("$@")
for STEP in 1 2 3 5 6; do
  python -m multimodal_neuroimage_tpu.cli.main --step "$STEP" "${COMMON[@]}"
done
python -m multimodal_neuroimage_tpu.cli.main --step 4 "${COMMON[@]}"
