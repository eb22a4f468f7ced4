#!/usr/bin/env bash
# Round-3 completion chain (single TPU client, serialized on the bench
# flock like every other tool): converts the remaining measurement backlog
# after the main sweep landed (docs/PERF.md decision table, 2026-08-19).
#
#   1. hashgrid render legs — re-run after the corner-loop encode fix
#      (the stacked (...,L,8) gather hard-crashed the v5e worker).
#   2. hashgrid train A/B — sorted segment-sum VJP (new default) vs the
#      XLA scatter-add baseline that measured 467 rays/s.
#   3. student-128 distill resume to 28 dB @ 400px -> export -> trained
#      student bench (NERF_BENCH_WEIGHTS).
#   4. hashgrid distill to 28 dB -> trained-checkpoint bench.
#   5. teacher convergence to 30 dB @ 400px (VERDICT r1 item 4).
#   6. headline-variant mini-sweep: off_probe stride/threshold variants
#      around the measured winner (off_probe_s4, 377 K rays/s).
#
# Everything is resumable: sweeps skip clean records (TPU_AB_SKIP_DONE),
# distills resume from their latest checkpoint. Kill by exact PID only.
set -u
cd "$(dirname "$0")/.."
LOG="${1:-/tmp/tpu_ab.jsonl}"
STATUS="${2:-/tmp/tpu_chain.status}"
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_cache_tpu}"

say() { echo "$(date +%FT%T) $*" >> "$STATUS"; }

say "chain start"

# -- 1+2: hashgrid legs (render fix + grad A/B) ------------------------
say "hashgrid legs"
TPU_AB_LEGS="hashgrid_800 hashgrid_s32x64 hashgrid_s128x0 hashgrid_train_srt hashgrid_train_sc" \
  TPU_AB_SKIP_DONE=1 bash tools/tpu_ab.sh "$LOG" >> "$STATUS" 2>&1
say "hashgrid legs done (rc=$?)"

# -- 3: student distill resume + trained bench -------------------------
say "student-128 distill resume (target 28 dB)"
CONV_TRAIN_ARGS="--width 128 --v-width 64" CONV_TARGET_DB=28 \
  bash tools/tpu_convergence.sh /tmp/tpu_student >> "$STATUS" 2>&1
say "student distill done (rc=$?)"
if [ -d /tmp/tpu_student/exported ]; then
  NERF_BENCH_WEIGHTS=/tmp/tpu_student/exported \
    NERF_BENCH_LOCK_WAIT=900 NERF_BENCH_DEADLINE=1500 \
    NERF_BENCH_SIZE=800 timeout 1800 python bench.py >> "$LOG" 2>>"$STATUS"
  say "trained-student bench appended"
  # The student is only worth its FLOPs if the fast configs hold quality:
  # frontier legs on the trained weights (32+64 and probe-culled).
  NERF_BENCH_WEIGHTS=/tmp/tpu_student/exported NERF_BENCH_SAMPLES=32,64 \
    NERF_BENCH_LOCK_WAIT=900 NERF_BENCH_DEADLINE=1500 \
    NERF_BENCH_SIZE=800 timeout 1800 python bench.py >> "$LOG" 2>>"$STATUS"
  say "trained-student 32+64 bench appended"
fi

# -- 4: hashgrid distill + trained bench --------------------------------
say "hashgrid distill (target 28 dB, max 8000 steps)"
CONV_TRAIN_ARGS="--model hashgrid" CONV_TARGET_DB=28 CONV_MAX_STEPS=8000 \
  bash tools/tpu_convergence.sh /tmp/tpu_hashgrid >> "$STATUS" 2>&1
say "hashgrid distill done (rc=$?)"
hg_ckpt=$(ls -d /tmp/tpu_hashgrid/ckpts/step_* 2>/dev/null | sort | tail -1)
if [ -n "$hg_ckpt" ]; then
  NERF_BENCH_MODEL=hashgrid NERF_BENCH_CHECKPOINT="$hg_ckpt" \
    NERF_BENCH_LOCK_WAIT=900 NERF_BENCH_DEADLINE=1500 \
    NERF_BENCH_SIZE=800 timeout 1800 python bench.py >> "$LOG" 2>>"$STATUS"
  say "trained-hashgrid bench appended"
fi

# -- 5: teacher convergence (the 30 dB milestone) -----------------------
say "teacher convergence resume (target 30 dB)"
bash tools/tpu_convergence.sh /tmp/tpu_convergence >> "$STATUS" 2>&1
say "teacher convergence done (rc=$?)"

# -- 6: headline-variant mini-sweep -------------------------------------
say "headline variants"
TPU_AB_LEGS="off_probe_s2 off_probe_s6 off_probe_s4_thresh off_probe_s4_256" \
  TPU_AB_SKIP_DONE=1 bash tools/tpu_ab.sh "$LOG" >> "$STATUS" 2>&1
say "headline variants done (rc=$?)"

say "chain done"
