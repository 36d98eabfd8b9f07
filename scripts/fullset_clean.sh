#!/bin/bash
# Full-15-image-set validation at the winning CLEAN settings (set1 sweeps).
# CPU; drunet 50-iter/x8 runs happen on the chip separately.
set -x
cd /root/repo
Z=/tmp/zoo_clean
OUT=/tmp/fullset_clean.jsonl
R() { # name args...
  n=$1; shift
  r=$(timeout 4000 python -m pnp_admm_cnc_mri_tpu.cli.main "$@" --cpu --testset set --no_save --results_dir /tmp/v/results 2>/dev/null | tail -1)
  echo "{\"cfg\": \"$n\", \"out\": $r}" >> $OUT
  echo "$n -> $r"
}
R l1_dncnn15   pnp_l1_d --model dncnn_15 --weights $Z/dncnn_15_clean.npz --iter_num 4 --reo 1.0
R l1_dncnn25   pnp_l1_d --model dncnn_25 --weights $Z/dncnn_25_clean.npz --iter_num 4 --reo 1.5
R l1_dncnn50   pnp_l1_d --model dncnn_50 --weights $Z/dncnn_50_clean.npz --iter_num 4 --reo 4.0
R l1_fdncnn    pnp_l1_d --model fdncnn_gray --weights $Z/fdncnn_gray_clean.npz --iter_num 8 --reo 0.5 --nlm 8
R l1_ffdnet    pnp_l1_d --model ffdnet_gray --weights $Z/ffdnet_gray_clean.npz --iter_num 10 --reo 0.5 --nlm 8
R l1_ircnn     pnp_l1_d --model ircnn_gray --weights $Z/ircnn_gray_clean.npz --iter_num 24 --reo 0.45 --nlm 5
R l1_drunet    pnp_l1_d --model drunet_gray --weights $Z/drunet_gray_clean.npz --iter_num 50 --reo 0.5 --nlm 8 --no_x8
R cnc_drunet   pnp_cnc_d --model drunet_gray --weights $Z/drunet_gray_clean.npz --iter_num 4 --alpha 1.4 --nlm 8
R cnc_ffdnet   pnp_cnc_d --model ffdnet_gray --weights $Z/ffdnet_gray_clean.npz --iter_num 8 --alpha 1.4 --nlm 12
R cnc_fdncnn   pnp_cnc_d --model fdncnn_gray --weights $Z/fdncnn_gray_clean.npz --iter_num 8 --alpha 1.0 --nlm 8
R cnc_ircnn    pnp_cnc_d --model ircnn_gray --weights $Z/ircnn_gray_clean.npz --iter_num 10 --alpha 0.7 --nlm 5
R cnc_pair     pnp_cnc_d --model dncnn_25 --weights $Z/dncnn_25_clean.npz --model2 dncnn_15 --weights2 $Z/dncnn_15_clean.npz --iter_num 6 --alpha 0.5
R cons_ffdnet  consensus_d --model ffdnet_gray --weights $Z/ffdnet_gray_clean.npz --iter_num 4 --reo 1.8 --nlm 12
R cons_fdncnn  consensus_d --model fdncnn_gray --weights $Z/fdncnn_gray_clean.npz --iter_num 4 --reo 1.8 --nlm 12
R cons_ircnn   consensus_d --model ircnn_gray --weights $Z/ircnn_gray_clean.npz --iter_num 4 --reo 0.8 --nlm 8
R cons_dncnn25 consensus_d --model dncnn_25 --weights $Z/dncnn_25_clean.npz --iter_num 4 --reo 3.0
R sr_drunet    pnp_sr --model drunet_gray --weights $Z/drunet_gray_clean.npz --sf 2 --iter_num 12 --nlm 4
R sr_ffdnet    pnp_sr --model ffdnet_gray --weights $Z/ffdnet_gray_clean.npz --sf 2 --iter_num 8 --nlm 8
R sr_fdncnn    pnp_sr --model fdncnn_gray --weights $Z/fdncnn_gray_clean.npz --sf 2 --iter_num 8 --nlm 8
R sr_ircnn     pnp_sr --model ircnn_gray --weights $Z/ircnn_gray_clean.npz --sf 2 --iter_num 12 --nlm 2
R sr_dncnn25   pnp_sr --model dncnn_25 --weights $Z/dncnn_25_clean.npz --sf 2 --iter_num 8 --nlm 8
R deb_drunet   pnp_deblur --model drunet_gray --weights $Z/drunet_gray_clean.npz --kernel aniso --iter_num 12 --nlm 4
R deb_ircnn    pnp_deblur --model ircnn_gray --weights $Z/ircnn_gray_clean.npz --kernel aniso --iter_num 12 --nlm 2
R deb_dncnn25  pnp_deblur --model dncnn_25 --weights $Z/dncnn_25_clean.npz --kernel aniso --iter_num 8 --nlm 8
echo DONE_FULLSET_CLEAN
# appended: conditioned-model deblur with the low sigma-ladder start
R deb_ffdnet   pnp_deblur --model ffdnet_gray --weights $Z/ffdnet_gray_clean.npz --kernel aniso --iter_num 8 --nlm 8 --model_sigma1 10
R deb_fdncnn   pnp_deblur --model fdncnn_gray --weights $Z/fdncnn_gray_clean.npz --kernel aniso --iter_num 8 --nlm 8 --model_sigma1 10
echo DONE_FULLSET_CLEAN2
