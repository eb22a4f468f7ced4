#!/usr/bin/env bash
# Round-4 chain — the VERDICT r3 milestone legs, in value order:
#
#   1. student128_30db benched at 800px WITH teacher_psnr_db
#      (quality-at-headline-resolution, VERDICT r3 weak-item 7).
#   2. the same weights at the s64x0_off_probe_s4 serving preset —
#      the untrained starting point of the >=1 M rays/s frontier leg.
#   3. single-pass fine-tune: retarget the student to 64+0 serving with
#      full-quality teacher targets (train --teacher-samples 64,128,
#      warm start --init-weights), then bench the export at the probe
#      preset. Goal: >=1 M rays/s with >=30 dB vs the teacher at 800px
#      (VERDICT r3 item 5).
#   4. int8-QAT fine-tune from the same student + bench under
#      --impl int8 (VERDICT r3 item 4's remaining leg).
#   5. train-mode bench at the sweep-chosen batch size (item 3 support).
#
# Every leg checks /tmp/nerf_round_deadline (tools/round_guard.sh) so
# the driver's end-of-round bench NEVER starves behind this chain
# (round-3 post-mortem). Benches serialize on the TPU flock bench.py
# itself takes; convergence chunks hold it <=30 min at a time.
set -u
cd "$(dirname "$0")/.."
LOG="${1:-/tmp/tpu_ab_r4.jsonl}"
STATUS="${2:-/tmp/tpu_chain_r4.status}"
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_cache_tpu}"
STUDENT=assets/trained/student128_30db

say() { echo "$(date +%FT%T) $*" >> "$STATUS"; }
past_deadline() {
  [ -f /tmp/nerf_round_deadline ] && \
    [ "$(date +%s)" -ge "$(cat /tmp/nerf_round_deadline)" ]
}
bench_leg() { # bench_leg <label> ENV=V...
  local label="$1"; shift
  if past_deadline; then say "$label SKIPPED (deadline)"; return 1; fi
  local out
  out=$(env "$@" NERF_BENCH_LOCK_WAIT=3600 NERF_BENCH_DEADLINE=1500 \
        NERF_BENCH_SIZE=800 timeout 5400 python bench.py 2>>"$STATUS")
  if [ -n "$out" ]; then
    echo "$out" | sed "s/^{/{\"config\": \"$label\", /" >> "$LOG"
    say "$label bench appended"
  else
    say "$label bench FAILED"
  fi
}

say "round-4 chain start"

# -- 1+2: trained-student benches (fast, highest evidence value) --------
bench_leg student30_800q \
  NERF_BENCH_WEIGHTS=$STUDENT NERF_BENCH_ACCEL=1 NERF_ACCEL_COMPACT=off \
  NERF_BENCH_AABB_PROBES=128 NERF_BENCH_RANGE_STRIDE=4
bench_leg student30_s64x0_probe \
  NERF_BENCH_WEIGHTS=$STUDENT NERF_BENCH_SAMPLES=64,0 NERF_BENCH_ACCEL=1 \
  NERF_ACCEL_COMPACT=off NERF_BENCH_ACCEL_AABB=1 \
  NERF_BENCH_AABB_PROBES=128 NERF_BENCH_RANGE_STRIDE=4

# -- 3: single-pass fine-tune (the >=1 M @ >=30 dB attempt) --------------
if ! past_deadline; then
  say "single-pass fine-tune start"
  CONV_TRAIN_ARGS="--width 128 --v-width 64 --coarse-samples 64 --fine-samples 0 --teacher-samples 64,128 --init-weights $STUDENT" \
  CONV_EVAL_ARGS="--fine-samples 0 --ref-samples 64,128" \
  CONV_TARGET_DB="${SP_TARGET_DB:-30}" CONV_MAX_STEPS="${SP_MAX_STEPS:-8000}" \
    bash tools/tpu_convergence.sh /tmp/tpu_sp >> "$STATUS" 2>&1
  say "single-pass fine-tune done (rc=$?)"
  if [ -d /tmp/tpu_sp/exported ]; then
    bench_leg sp_student_s64x0_probe \
      NERF_BENCH_WEIGHTS=/tmp/tpu_sp/exported NERF_BENCH_SAMPLES=64,0 \
      NERF_BENCH_ACCEL=1 NERF_ACCEL_COMPACT=off NERF_BENCH_ACCEL_AABB=1 \
      NERF_BENCH_AABB_PROBES=128 NERF_BENCH_RANGE_STRIDE=4
    bench_leg sp_student_s64x0_uniform \
      NERF_BENCH_WEIGHTS=/tmp/tpu_sp/exported NERF_BENCH_SAMPLES=64,0
  fi
fi

# -- 4: int8-QAT fine-tune + int8 serving bench ---------------------------
if ! past_deadline; then
  say "int8-QAT fine-tune start"
  CONV_TRAIN_ARGS="--impl int8qat --width 128 --v-width 64 --init-weights $STUDENT" \
  CONV_EVAL_ARGS="--impl int8" \
  CONV_TARGET_DB="${QAT_TARGET_DB:-29.5}" CONV_MAX_STEPS="${QAT_MAX_STEPS:-4000}" \
    bash tools/tpu_convergence.sh /tmp/tpu_int8r4 >> "$STATUS" 2>&1
  say "int8-QAT fine-tune done (rc=$?)"
  if [ -d /tmp/tpu_int8r4/exported ]; then
    bench_leg int8_student_trained \
      NERF_BENCH_WEIGHTS=/tmp/tpu_int8r4/exported NERF_BENCH_IMPL=int8 \
      NERF_BENCH_ACCEL=1 NERF_ACCEL_COMPACT=off \
      NERF_BENCH_AABB_PROBES=128 NERF_BENCH_RANGE_STRIDE=4
    bench_leg int8_student_s32x64 \
      NERF_BENCH_WEIGHTS=/tmp/tpu_int8r4/exported NERF_BENCH_IMPL=int8 \
      NERF_BENCH_SAMPLES=32,64
  fi
fi

# -- 5: train-mode benches: sweep-chosen batch; the student-family work-
#       reduction axis; the single-pass student (production fine-tune cfg)
bench_leg train_step_b"${TRAIN_RAYS:-32768}" \
  NERF_BENCH_MODE=train NERF_BENCH_TRAIN_RAYS="${TRAIN_RAYS:-32768}"
bench_leg train_student_b"${TRAIN_RAYS:-32768}" \
  NERF_BENCH_MODE=train NERF_BENCH_TRAIN_RAYS="${TRAIN_RAYS:-32768}" \
  NERF_BENCH_ARCH=128,64
bench_leg train_student_s64x0 \
  NERF_BENCH_MODE=train NERF_BENCH_TRAIN_RAYS="${TRAIN_RAYS:-32768}" \
  NERF_BENCH_ARCH=128,64 NERF_BENCH_SAMPLES=64,0

say "round-4 chain done"
