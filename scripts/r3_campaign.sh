#!/bin/bash
# Round-3 TPU measurement campaign — run when the axon tunnel is back.
# Each phase logs to /tmp/r3_campaign/; kernels compile in 3-10 min each
# through the remote compiler, so the full campaign is hours — run under
# nohup/timeout in the background and poll the logs.
#
#   bash scripts/r3_campaign.sh [phase]
# phases: checks bench cells profile quality   (default: all in order)

set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r3_campaign
# Persistent compile cache: axon compiles cost minutes each, and the tunnel
# has died mid-campaign before — cache executables so re-runs resume fast.
# (If the PJRT plugin can't serialize executables JAX logs and skips it.)
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/root/.cache/jax_comp}"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5
mkdir -p "$JAX_COMPILATION_CACHE_DIR"
mkdir -p $LOG
PHASE="${1:-all}"

run() { # run <name> <timeout_s> <cmd...>
  local name=$1 to=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$to" "$@" 2>&1 | tee "$LOG/$name.log" | tail -20
}

if [[ $PHASE == all || $PHASE == checks ]]; then
  # Hardware validation of the kernel stack (golden bounds, fp-divergence).
  run tpu_checks 3600 python scripts/tpu_checks.py
fi

if [[ $PHASE == all || $PHASE == bench ]]; then
  # Headline at the unchanged bench config (1x1 cells).
  run bench_1x1 7200 python bench.py
fi

if [[ $PHASE == all || $PHASE == cells ]]; then
  # Raster-cell grouping: the candidate default. Fresh compiles per cell.
  BENCH_CELL=2x2 run bench_2x2 7200 python bench.py
  BENCH_CELL=4x2 run bench_4x2 7200 python bench.py
fi

if [[ $PHASE == all || $PHASE == profile ]]; then
  run profile_stages 5400 python scripts/profile_r3.py stages
  run profile_variants 10800 python scripts/profile_r3.py variants
  run profile_bwd 5400 python scripts/profile_r3.py bwd
  run profile_strip 5400 python scripts/profile_r3.py strip
fi

if [[ $PHASE == all || $PHASE == quality ]]; then
  # VERDICT r2 item 7: full 16-view harvests bracketing the reference's 7k
  # mark, plus the regenerated 30k view grid. Requires data/castle_800.zip
  # and /tmp/castle_ckpt3 checkpoints from the round-2 run.
  for ck in 0006000 0009000 final; do
    run "harvest_$ck" 7200 python scripts/harvest_run.py \
      data/castle_800.zip /tmp/castle_ckpt3/ckpt_$ck.npz \
      /tmp/r3_campaign/castle_$ck
  done
  [ -f /tmp/scene_r3.zip ] || \
    run make_scene 1800 python scripts/make_synth_scene.py /tmp/scene_r3.zip 24 256 120
  run train_gate 7200 python scripts/train_synth_tpu.py /tmp/scene_r3.zip 1500
fi

echo "campaign phase '$PHASE' done; logs in $LOG"
