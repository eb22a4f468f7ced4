#!/usr/bin/env bash
# Round-5 chain: evidence legs for the poly-trig kernel (98.8 -> 138
# TFLOP/s), the 30 dB @ >=1M config, train-mode throughput, and the int8
# decision — VERDICT r4 items 1, 3, 4, 5.
#
# Sequence:
#   1. Bench legs with the new kernel defaults (dense, lossless headline,
#      teacher single-pass + probes — the zero-training 30 dB @ >=1M
#      config — student/sp29 re-baselines).
#   2. Train-mode legs at 16384 rays (the r4 32768-shape legs blew the
#      bench deadline on compiles; 16384 is the production batch).
#   3. Teacher single-pass placement-aware fine-tune (quality margin over
#      the 30.1 dB zero-training point), then its serving benches.
#   4. int8: PTQ serving leg + short QAT fine-tune + QAT serving leg
#      (promote or retire with numbers either way).
#   5. Bare-default validation (what the driver runs, incl. the frontier
#      preset emission).
#
# All legs deadline-guarded (tools/round_guard.sh) and lock-serialized.
set -u
cd "$(dirname "$0")/.."
LOG="${1:-/tmp/tpu_ab_r5.jsonl}"
STATUS="${2:-/tmp/tpu_chain_r5.status}"
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_cache_tpu}"
STUDENT=assets/trained/student128_30db
SP29=assets/trained/student128_sp29
TEACHER=assets/lego_rust

say() { echo "$(date +%FT%T) $*" >> "$STATUS"; }
past_deadline() {
  [ -f /tmp/nerf_round_deadline ] && \
    [ "$(date +%s)" -ge "$(cat /tmp/nerf_round_deadline)" ]
}
bench_leg() { # bench_leg <label> ENV=V...
  local label="$1"; shift
  if past_deadline; then say "$label SKIPPED (deadline)"; return 1; fi
  local out
  out=$(env "$@" NERF_BENCH_LOCK_WAIT=3600 NERF_BENCH_DEADLINE=1200 \
        NERF_BENCH_SIZE=800 timeout 3600 python bench.py 2>>"$STATUS")
  if [ -n "$out" ]; then
    echo "$out" | sed "s/^{/{\"config\": \"$label\", /" >> "$LOG"
    say "$label bench appended"
  else
    say "$label bench FAILED"
  fi
}

say "round-5 chain start"

# -- 1: kernel-win evidence legs -----------------------------------------
bench_leg dense_800 NERF_BENCH_ACCEL=0 NERF_BENCH_REPEATS=5
bench_leg off_probe_s4 NERF_BENCH_REPEATS=5 NERF_BENCH_EXTRA=0
# The zero-training 30 dB @ >=1M point: pretrained teacher, single-pass
# 64+0 with probe-refined placement (NERF_BENCH_WEIGHTS so the record
# carries teacher_psnr_db — these ARE the teacher weights, so the axis is
# identical to full_psnr_db, stated explicitly for the frontier table).
bench_leg teacher_s64x0_probe \
  NERF_BENCH_WEIGHTS=$TEACHER NERF_BENCH_SAMPLES=64,0 \
  NERF_BENCH_ACCEL=1 NERF_BENCH_ACCEL_AABB=1 NERF_BENCH_REPEATS=8
bench_leg student30_800q NERF_BENCH_WEIGHTS=$STUDENT NERF_BENCH_REPEATS=5
bench_leg sp29_s64x0_probe \
  NERF_BENCH_WEIGHTS=$SP29 NERF_BENCH_SAMPLES=64,0 \
  NERF_BENCH_ACCEL=1 NERF_BENCH_ACCEL_AABB=1 NERF_BENCH_REPEATS=8

# -- 2: train-mode legs (16384-ray production batch) ----------------------
bench_leg train_teacher_b16384 NERF_BENCH_MODE=train NERF_BENCH_REPEATS=5
bench_leg train_student_b16384 \
  NERF_BENCH_MODE=train NERF_BENCH_ARCH=128,64 NERF_BENCH_REPEATS=5
bench_leg train_student_s64x0 \
  NERF_BENCH_MODE=train NERF_BENCH_ARCH=128,64 NERF_BENCH_SAMPLES=64,0 \
  NERF_BENCH_REPEATS=5
# One 32768 attempt now that the compile cache is warm from the 16384 legs.
bench_leg train_teacher_b32768 \
  NERF_BENCH_MODE=train NERF_BENCH_TRAIN_RAYS=32768 NERF_BENCH_REPEATS=3

# -- 3: teacher single-pass placement-aware fine-tune ---------------------
if ! past_deadline; then
  say "teacher single-pass fine-tune start"
  CONV_TRAIN_ARGS="--coarse-samples 64 --fine-samples 0 --teacher-samples 64,128 --lr 1e-4 --accel-every 500 --accel-warmup 0 --accel-res 128 --accel-aabb --accel-probes 128 --init-weights $TEACHER" \
  CONV_EVAL_ARGS="--fine-samples 0 --ref-samples 64,128 --accel-probes 128" \
  CONV_TARGET_DB="${TSP_TARGET_DB:-31.5}" CONV_MAX_STEPS="${TSP_MAX_STEPS:-5000}" \
    bash tools/tpu_convergence.sh /tmp/tpu_tsp >> "$STATUS" 2>&1
  say "teacher single-pass fine-tune done (rc=$?)"
fi
if [ -d /tmp/tpu_tsp/exported ]; then
  bench_leg tsp_s64x0_probe \
    NERF_BENCH_WEIGHTS=/tmp/tpu_tsp/exported NERF_BENCH_SAMPLES=64,0 \
    NERF_BENCH_ACCEL=1 NERF_BENCH_ACCEL_AABB=1 NERF_BENCH_REPEATS=8
  bench_leg tsp_s48x0_probe \
    NERF_BENCH_WEIGHTS=/tmp/tpu_tsp/exported NERF_BENCH_SAMPLES=48,0 \
    NERF_BENCH_ACCEL=1 NERF_BENCH_ACCEL_AABB=1 NERF_BENCH_REPEATS=8
  bench_leg tsp_headline NERF_BENCH_WEIGHTS=/tmp/tpu_tsp/exported \
    NERF_BENCH_REPEATS=5
fi

# -- 4: int8 serving decision --------------------------------------------
bench_leg int8_ptq_student30_probe \
  NERF_BENCH_WEIGHTS=$STUDENT NERF_BENCH_IMPL=int8 NERF_BENCH_REPEATS=5
if ! past_deadline; then
  say "int8-QAT fine-tune start"
  CONV_TRAIN_ARGS="--impl int8qat --width 128 --v-width 64 --init-weights $STUDENT" \
  CONV_EVAL_ARGS="--impl int8" \
  CONV_TARGET_DB="${QAT_TARGET_DB:-29.5}" CONV_MAX_STEPS="${QAT_MAX_STEPS:-1500}" \
    bash tools/tpu_convergence.sh /tmp/tpu_int8r5 >> "$STATUS" 2>&1
  say "int8-QAT fine-tune done (rc=$?)"
  if [ -d /tmp/tpu_int8r5/exported ]; then
    bench_leg int8_qat_student_trained \
      NERF_BENCH_WEIGHTS=/tmp/tpu_int8r5/exported NERF_BENCH_IMPL=int8 \
      NERF_BENCH_REPEATS=5
  fi
fi

# -- 5: bare-default validation (incl. frontier preset emission) ----------
if ! past_deadline; then
  say "bare default check start"
  out=$(NERF_BENCH_LOCK_WAIT=3600 timeout 3600 python bench.py 2>>"$STATUS")
  if [ -n "$out" ]; then
    echo "$out" | sed "s/^{/{\"config\": \"bare_default\", /" >> "$LOG"
    say "bare default check appended ($(echo "$out" | wc -l) lines)"
  else
    say "bare default check FAILED"
  fi
fi

say "round-5 chain done"
