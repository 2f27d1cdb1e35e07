#!/bin/bash
# BERT forward ablation ladder (ROADMAP round-6 lever #2): per-layer
# training-forward cost at the flagship bs=64 geometry, decomposed with
# the in-kernel BERT_ABLATE knobs (same methodology that cracked the
# fusion kernels). Run on the real TPU; ~6 compiles through the tunnel.
#
# Bands (subtract adjacent rungs):
#   copy            -> kernel shell + DMA floor
#   noattn - copy   -> QKV + FFN + LN + hidden dropout
#   noffn  - copy   -> full attention + LN tail (no FFN)
#   dotsonly        -> + packs + score/context dots
#   nosm - dotsonly -> keypad mask add
#   full - nosm     -> segment softmax + attention dropout
set -u
cd "$(dirname "$0")/.."
B=${MICRO_B:-64}
PHASE=${1:-trainfwd}
for abl in "" copy noattn dotsonly nosm noffn; do
  BERT_ABLATE=$abl MICRO_B=$B timeout 600 \
    python scripts/bench_bert_micro.py "$PHASE" 2>&1 | grep "^bert/"
done
