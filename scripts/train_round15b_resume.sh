#!/bin/bash
# Round-3 campaign, tunnel-hardened restart: waits for axon TPU health
# before each job, bounds each job, retries once on failure. Skips jobs
# whose output npz already exists (synth128 completed in the first
# attempt before the tunnel outage killed synth1024 mid-compile).
set -x
cd /root/repo
mkdir -p /tmp/zoo_r3
COMMON="--lr_decay cosine --ema 0.999 --scan_steps 200 --ckpt_every 10000 \
  --synth_size 128 --patch 64"

wait_tpu() {
  until timeout 90 python -c \
    "import jax, jax.numpy as jnp; print(float(jnp.ones((2,2)).sum()))" \
    >/dev/null 2>&1; do
    echo "tunnel down $(date), sleeping 180s"
    sleep 180
  done
  echo "tunnel up $(date)"
}

run_job() {  # run_job <out> <job args...>
  local out=$1; shift
  if [ -f "$out" ]; then echo "SKIP existing $out"; return 0; fi
  for attempt in 1 2; do
    wait_tpu
    if timeout 5400 python -m pnp_admm_cnc_mri_tpu.cli.train_denoiser \
        $COMMON "$@" --out "$out"; then
      echo "DONE $out"; return 0
    fi
    echo "RETRY $out (attempt $attempt failed)"
  done
  echo "FAILED $out"; return 1
}

run_job /tmp/zoo_r3/drunet_synth1024.npz \
  --model drunet --sigma 0 --sigma_max 50 --steps 60000 --batch 16 \
  --synth 1024 --synth_refresh 0
run_job /tmp/zoo_r3/drunet_synth8192.npz \
  --model drunet --sigma 0 --sigma_max 50 --steps 60000 --batch 16 \
  --synth 8192 --synth_refresh 0
run_job /tmp/zoo_r3/drunet_stream.npz \
  --model drunet --sigma 0 --sigma_max 50 --steps 150000 --batch 16 \
  --synth 4096 --synth_refresh 2000
run_job /tmp/zoo_r3/tdnet_stream.npz \
  --model tdnet --nc 128 --sigma 0 --sigma_max 50 --steps 120000 \
  --batch 32 --synth 4096 --synth_refresh 2000
echo DONE_ALL_R15B
