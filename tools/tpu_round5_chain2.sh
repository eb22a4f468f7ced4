#!/usr/bin/env bash
# Round-5 chain 2: redo the fine-tune legs that crashed on the f32
# tile-4096 scoped-VMEM bug (fixed: f32 mode keeps fwd tile 1024), then
# their serving benches.
set -u
cd "$(dirname "$0")/.."
LOG="${1:-/tmp/tpu_ab_r5.jsonl}"
STATUS="${2:-/tmp/tpu_chain_r5.status}"
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_cache_tpu}"
STUDENT=assets/trained/student128_30db
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

say "round-5 chain2 start"

# -- 1: teacher single-pass placement-aware fine-tune (retry) -------------
if ! past_deadline; then
  say "teacher single-pass fine-tune retry start"
  CONV_TRAIN_ARGS="--coarse-samples 64 --fine-samples 0 --teacher-samples 64,128 --lr 1e-4 --accel-every 500 --accel-warmup 0 --accel-res 128 --accel-aabb --accel-probes 128 --init-weights $TEACHER" \
  CONV_EVAL_ARGS="--fine-samples 0 --ref-samples 64,128 --accel-probes 128" \
  CONV_TARGET_DB="${TSP_TARGET_DB:-31.5}" CONV_MAX_STEPS="${TSP_MAX_STEPS:-5000}" \
    bash tools/tpu_convergence.sh /tmp/tpu_tsp2 >> "$STATUS" 2>&1
  say "teacher single-pass fine-tune done (rc=$?)"
fi
if [ -d /tmp/tpu_tsp2/exported ]; then
  bench_leg tsp_s64x0_probe \
    NERF_BENCH_WEIGHTS=/tmp/tpu_tsp2/exported NERF_BENCH_SAMPLES=64,0 \
    NERF_BENCH_ACCEL=1 NERF_BENCH_ACCEL_AABB=1 NERF_BENCH_REPEATS=8
  bench_leg tsp_s48x0_probe \
    NERF_BENCH_WEIGHTS=/tmp/tpu_tsp2/exported NERF_BENCH_SAMPLES=48,0 \
    NERF_BENCH_ACCEL=1 NERF_BENCH_ACCEL_AABB=1 NERF_BENCH_REPEATS=8
  bench_leg tsp_headline NERF_BENCH_WEIGHTS=/tmp/tpu_tsp2/exported \
    NERF_BENCH_REPEATS=5
fi

# -- 2: int8-QAT fine-tune (retry) ----------------------------------------
if ! past_deadline; then
  say "int8-QAT fine-tune retry start"
  CONV_TRAIN_ARGS="--impl int8qat --width 128 --v-width 64 --init-weights $STUDENT" \
  CONV_EVAL_ARGS="--impl int8" \
  CONV_TARGET_DB="${QAT_TARGET_DB:-29.5}" CONV_MAX_STEPS="${QAT_MAX_STEPS:-1500}" \
    bash tools/tpu_convergence.sh /tmp/tpu_int8r5b >> "$STATUS" 2>&1
  say "int8-QAT fine-tune done (rc=$?)"
  if [ -d /tmp/tpu_int8r5b/exported ]; then
    bench_leg int8_qat_student_trained \
      NERF_BENCH_WEIGHTS=/tmp/tpu_int8r5b/exported NERF_BENCH_IMPL=int8 \
      NERF_BENCH_REPEATS=5
  fi
fi

say "round-5 chain2 done"
