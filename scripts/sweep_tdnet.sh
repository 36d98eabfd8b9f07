#!/bin/bash
# TDNet tuned-parameter sweep (set1, CPU) for the FISTA family: ladder
# endpoint nlm x ladder start model_sigma1. Run after a tdnet npz exists.
#   bash scripts/sweep_tdnet.sh zoo_r3/tdnet_distill.npz results/tdnet_sweep.jsonl
set -e
cd /root/repo
W=${1:-zoo_r3/tdnet_distill.npz}
OUT=${2:-results/tdnet_sweep.jsonl}
for nlm in 8 10 12 15; do
  for ms1 in 15 25 49; do
    python scripts/eval_r3_weights.py --weights "$W" --model tdnet \
      --sets set1 --out "$OUT" \
      --extra "--iter_num 30 --nlm $nlm --model_sigma1 $ms1"
  done
done
