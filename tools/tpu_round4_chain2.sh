#!/usr/bin/env bash
# Round-4 chain v2 — replaces the v1 fine-tune leg after the measured
# placement-mismatch finding (docs/PERF.md round-4): the uniform-
# placement single-pass fine-tune crawled (+0.14 dB/1000 steps) because
# the serving preset integrates at probe-placed samples. v2 trains AND
# evaluates under the serving placement (train --accel-aabb
# --accel-probes 128, evaluate --accel-probes 128), then runs the v1
# legs that never started (int8-QAT, train-mode benches).
#
# Deadline-guarded like v1 (tools/round_guard.sh).
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

say "round-4 chain v2 start"

# -- 1: placement-aware single-pass fine-tune ----------------------------
if ! past_deadline; then
  say "placement-aware single-pass fine-tune start"
  CONV_TRAIN_ARGS="--width 128 --v-width 64 --coarse-samples 64 --fine-samples 0 --teacher-samples 64,128 --init-weights $STUDENT --accel-every 500 --accel-warmup 0 --accel-res 128 --accel-aabb --accel-probes 128" \
  CONV_EVAL_ARGS="--fine-samples 0 --ref-samples 64,128 --accel-probes 128" \
  CONV_TARGET_DB="${SP_TARGET_DB:-30}" CONV_MAX_STEPS="${SP_MAX_STEPS:-6000}" \
    bash tools/tpu_convergence.sh /tmp/tpu_sp2 >> "$STATUS" 2>&1
  say "placement-aware fine-tune done (rc=$?)"
  if [ -d /tmp/tpu_sp2/exported ]; then
    bench_leg sp2_student_s64x0_probe \
      NERF_BENCH_WEIGHTS=/tmp/tpu_sp2/exported NERF_BENCH_SAMPLES=64,0 \
      NERF_BENCH_ACCEL=1 NERF_ACCEL_COMPACT=off NERF_BENCH_ACCEL_AABB=1 \
      NERF_BENCH_AABB_PROBES=128 NERF_BENCH_RANGE_STRIDE=4 \
      NERF_FUSED_TILE=2048
  fi
fi

# -- 2: train-mode benches (cheap; land before the long QAT leg) ---------
bench_leg train_step_b32768 \
  NERF_BENCH_MODE=train NERF_BENCH_TRAIN_RAYS=32768
bench_leg train_student_b32768 \
  NERF_BENCH_MODE=train NERF_BENCH_TRAIN_RAYS=32768 NERF_BENCH_ARCH=128,64
bench_leg train_student_s64x0 \
  NERF_BENCH_MODE=train NERF_BENCH_TRAIN_RAYS=32768 NERF_BENCH_ARCH=128,64 \
  NERF_BENCH_SAMPLES=64,0

# -- 3: int8-QAT fine-tune + int8 serving bench ---------------------------
if ! past_deadline; then
  say "int8-QAT fine-tune start"
  CONV_TRAIN_ARGS="--impl int8qat --width 128 --v-width 64 --init-weights $STUDENT" \
  CONV_EVAL_ARGS="--impl int8" \
  CONV_TARGET_DB="${QAT_TARGET_DB:-29.5}" CONV_MAX_STEPS="${QAT_MAX_STEPS:-3000}" \
    bash tools/tpu_convergence.sh /tmp/tpu_int8r4 >> "$STATUS" 2>&1
  say "int8-QAT fine-tune done (rc=$?)"
  if [ -d /tmp/tpu_int8r4/exported ]; then
    bench_leg int8_student_trained \
      NERF_BENCH_WEIGHTS=/tmp/tpu_int8r4/exported NERF_BENCH_IMPL=int8 \
      NERF_BENCH_ACCEL=1 NERF_ACCEL_COMPACT=off \
      NERF_BENCH_AABB_PROBES=128 NERF_BENCH_RANGE_STRIDE=4
  fi
fi

say "round-4 chain v2 done"
