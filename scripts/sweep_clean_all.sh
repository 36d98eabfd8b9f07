#!/bin/bash
# Round-2 master sweep: re-tune every pipeline for the LEAKAGE-FREE clean
# weights (set1/Q_Random30 grids; full-set validation happens separately
# at the winning settings). Serial — the box has 4 cores.
set -x
cd /root/repo
Z=/tmp/zoo_clean
OUT=/tmp/sweeps_clean
mkdir -p $OUT
S() { timeout 4000 python scripts/sweep_clean.py "$@"; }

# --- remaining PnP-L1 families ---
S --algo pnp_l1_d --model dncnn_50 --weights $Z/dncnn_50_clean.npz \
  --iters 3,4,6 --rhos 1.5,2.0,3.0,4.0 --out $OUT/l1_dncnn50.jsonl
# --- CNC-D (alpha grids; defaults pull iter/lam/rho/b from PNP_CNC_DEFAULTS) ---
S --algo pnp_cnc_d --model drunet_gray --weights $Z/drunet_gray_clean.npz \
  --iters 4,8,14 --alphas 1.0,1.4,1.8 --nlms 5,8 --out $OUT/cnc_drunet.jsonl
S --algo pnp_cnc_d --model ffdnet_gray --weights $Z/ffdnet_gray_clean.npz \
  --iters 4,8 --alphas 1.0,1.4,1.8 --nlms 8,12 --out $OUT/cnc_ffdnet.jsonl
S --algo pnp_cnc_d --model fdncnn_gray --weights $Z/fdncnn_gray_clean.npz \
  --iters 4,8 --alphas 1.0,1.4,1.8 --nlms 8,12 --out $OUT/cnc_fdncnn.jsonl
S --algo pnp_cnc_d --model ircnn_gray --weights $Z/ircnn_gray_clean.npz \
  --iters 6,10 --alphas 0.7,1.0,1.4 --nlms 5,8 --out $OUT/cnc_ircnn.jsonl
S --algo pnp_cnc_d --model dncnn_25 --weights $Z/dncnn_25_clean.npz \
  --extra "--model2 dncnn_15 --weights2 $Z/dncnn_15_clean.npz" \
  --iters 4,5,6 --alphas 0.5,0.7,1.0 --out $OUT/cnc_pair.jsonl
# --- consensus_d (multi-mask; the framework's best MRI numbers) ---
S --algo consensus_d --model drunet_gray --weights $Z/drunet_gray_clean.npz \
  --iters 4,8,14 --rhos 0.8,1.2,1.8 --nlms 5,8 --out $OUT/cons_drunet.jsonl
S --algo consensus_d --model ffdnet_gray --weights $Z/ffdnet_gray_clean.npz \
  --iters 4,8 --rhos 1.2,1.8,2.4 --nlms 8,12 --out $OUT/cons_ffdnet.jsonl
S --algo consensus_d --model fdncnn_gray --weights $Z/fdncnn_gray_clean.npz \
  --iters 4,8 --rhos 1.2,1.8,2.4 --nlms 8,12 --out $OUT/cons_fdncnn.jsonl
S --algo consensus_d --model ircnn_gray --weights $Z/ircnn_gray_clean.npz \
  --iters 4,8 --rhos 0.8,1.2,1.8 --nlms 5,8 --out $OUT/cons_ircnn.jsonl
S --algo consensus_d --model dncnn_25 --weights $Z/dncnn_25_clean.npz \
  --iters 4,6 --rhos 1.8,2.4,3.0 --out $OUT/cons_dncnn25.jsonl
# --- SR x2 (item 8: all five families) ---
for m in drunet_gray ffdnet_gray fdncnn_gray ircnn_gray dncnn_25; do
  S --algo pnp_sr --model $m --weights $Z/${m}_clean.npz \
    --extra "--sf 2" --iters 8,12 --nlms 2,4,8 --out $OUT/sr_$m.jsonl
done
# --- deblur aniso (item 8) ---
for m in drunet_gray ffdnet_gray fdncnn_gray ircnn_gray dncnn_25; do
  S --algo pnp_deblur --model $m --weights $Z/${m}_clean.npz \
    --extra "--kernel aniso" --iters 8,12 --nlms 2,4,8 --out $OUT/deblur_$m.jsonl
done
echo DONE_SWEEP_ALL
