#!/usr/bin/env bash
# Round-4 chain v4 (final): serving-matched placement pad, then evidence.
#
# v3's low-lr consolidation gained +0.6 dB then flattened at ~29.3 —
# the residual train/serve gap is the POOLED serving ranges (stride-4
# 3x3 union) vs the exact per-ray ranges training sampled. Leg 1 adapts
# the field for ~1.5K steps with `--accel-pad 4` (training ranges padded
# to the pooling slack) at lr 1e-4, then exports and runs every
# remaining evidence leg. All deadline-guarded (tools/round_guard.sh).
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
  out=$(env "$@" NERF_BENCH_LOCK_WAIT=3600 NERF_BENCH_DEADLINE=1200 \
        NERF_BENCH_SIZE=800 timeout 3600 python bench.py 2>>"$STATUS")
  if [ -n "$out" ]; then
    echo "$out" | sed "s/^{/{\"config\": \"$label\", /" >> "$LOG"
    say "$label bench appended"
  else
    say "$label bench FAILED"
  fi
}

say "round-4 chain v4 start"

# -- 1: pad-matched placement adaptation ---------------------------------
if ! past_deadline; then
  CONV_TRAIN_ARGS="--width 128 --v-width 64 --coarse-samples 64 --fine-samples 0 --teacher-samples 64,128 --lr 1e-4 --accel-every 500 --accel-warmup 0 --accel-res 128 --accel-aabb --accel-probes 128 --accel-pad 4" \
  CONV_EVAL_ARGS="--fine-samples 0 --ref-samples 64,128 --accel-probes 128" \
  CONV_TARGET_DB="${SP_TARGET_DB:-30}" CONV_MAX_STEPS="${SP_MAX_STEPS:-6500}" \
    bash tools/tpu_convergence.sh /tmp/tpu_sp2 >> "$STATUS" 2>&1
  say "pad-matched adaptation done (rc=$?)"
fi

# -- 2: single-pass benches with the fine-tuned export -------------------
if [ -d /tmp/tpu_sp2/exported ]; then
  bench_leg sp2_s64x0_probe \
    NERF_BENCH_WEIGHTS=/tmp/tpu_sp2/exported NERF_BENCH_SAMPLES=64,0 \
    NERF_BENCH_ACCEL=1 NERF_BENCH_ACCEL_AABB=1
  bench_leg sp2_s64x0_probe_s8 \
    NERF_BENCH_WEIGHTS=/tmp/tpu_sp2/exported NERF_BENCH_SAMPLES=64,0 \
    NERF_BENCH_ACCEL=1 NERF_BENCH_ACCEL_AABB=1 NERF_BENCH_RANGE_STRIDE=8
  bench_leg sp2_headline \
    NERF_BENCH_WEIGHTS=/tmp/tpu_sp2/exported
fi

# -- 3: train-mode benches ------------------------------------------------
bench_leg train_step_b32768 \
  NERF_BENCH_MODE=train NERF_BENCH_TRAIN_RAYS=32768
bench_leg train_student_b32768 \
  NERF_BENCH_MODE=train NERF_BENCH_TRAIN_RAYS=32768 NERF_BENCH_ARCH=128,64
bench_leg train_student_s64x0 \
  NERF_BENCH_MODE=train NERF_BENCH_TRAIN_RAYS=32768 NERF_BENCH_ARCH=128,64 \
  NERF_BENCH_SAMPLES=64,0

# -- 4: short int8-QAT + int8 serving bench -------------------------------
if ! past_deadline; then
  say "int8-QAT fine-tune start"
  CONV_TRAIN_ARGS="--impl int8qat --width 128 --v-width 64 --init-weights $STUDENT" \
  CONV_EVAL_ARGS="--impl int8" \
  CONV_TARGET_DB="${QAT_TARGET_DB:-29.5}" CONV_MAX_STEPS="${QAT_MAX_STEPS:-2000}" \
    bash tools/tpu_convergence.sh /tmp/tpu_int8r4 >> "$STATUS" 2>&1
  say "int8-QAT fine-tune done (rc=$?)"
  if [ -d /tmp/tpu_int8r4/exported ]; then
    bench_leg int8_student_trained \
      NERF_BENCH_WEIGHTS=/tmp/tpu_int8r4/exported NERF_BENCH_IMPL=int8
  fi
fi

# -- 5: validate the bare-default bench (what the driver will run) -------
bench_leg bare_default_check

say "round-4 chain v4 done"
