#!/usr/bin/env bash
# Round-3 chain v3 — the remaining phases after chain2's in-flight QAT
# distill. Exists because editing a RUNNING bash script shifts its read
# offset (chain2's bench_leg fix landed mid-flight); chain2's main bash
# is killed at the QAT boundary and this script takes over:
#
#   0. wait for the orphaned QAT convergence run (/tmp/tpu_int8) to
#      finish (summary.json/exported appears, or its process exits).
#   1. int8 trained benches (64+128 and 32+64, --impl int8 serving).
#   2. student-128 continued to 30 dB -> bench.
#   3. teacher convergence with whatever window remains.
set -u
cd "$(dirname "$0")/.."
LOG="${1:-/tmp/tpu_ab.jsonl}"
STATUS="${2:-/tmp/tpu_chain3.status}"
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_cache_tpu}"

say() { echo "$(date +%FT%T) $*" >> "$STATUS"; }
bench_leg() { # bench_leg <label> ENV=V...
  local label="$1"; shift
  local out
  out=$(env "$@" NERF_BENCH_LOCK_WAIT=7200 NERF_BENCH_DEADLINE=1500 \
        NERF_BENCH_SIZE=800 timeout 9000 python bench.py 2>>"$STATUS")
  if [ -n "$out" ]; then
    echo "$out" | sed "s/^{/{\"config\": \"$label\", /" >> "$LOG"
    say "$label bench appended"
  else
    say "$label bench FAILED"
  fi
}

say "chain3 start"

# -- 0: wait for the in-flight QAT distill ------------------------------
while pgrep -f "tpu_convergence.sh /tmp/tpu_int8" >/dev/null 2>&1; do
  sleep 60
done
say "QAT convergence process gone (finished or killed)"

# -- 1: int8 trained benches ---------------------------------------------
if [ -d /tmp/tpu_int8/exported ]; then
  bench_leg int8_trained \
    NERF_BENCH_WEIGHTS=/tmp/tpu_int8/exported NERF_BENCH_IMPL=int8
  bench_leg int8_trained_s32x64 \
    NERF_BENCH_WEIGHTS=/tmp/tpu_int8/exported NERF_BENCH_IMPL=int8 \
    NERF_BENCH_SAMPLES=32,64
else
  say "no /tmp/tpu_int8/exported — QAT distill did not converge/export"
fi

# -- 2: student onward to 30 dB -----------------------------------------
say "student-128 continue (target 30 dB)"
CONV_TRAIN_ARGS="--width 128 --v-width 64" CONV_TARGET_DB=30 \
  CONV_MAX_STEPS=24000 \
  bash tools/tpu_convergence.sh /tmp/tpu_student >> "$STATUS" 2>&1
say "student 30 dB leg done (rc=$?)"
if [ -d /tmp/tpu_student/exported ]; then
  bench_leg student30_trained NERF_BENCH_WEIGHTS=/tmp/tpu_student/exported
fi

# -- 3: teacher convergence with the remaining window --------------------
say "teacher convergence resume (target 30 dB; runs until round end)"
bash tools/tpu_convergence.sh /tmp/tpu_convergence >> "$STATUS" 2>&1
say "teacher convergence done (rc=$?)"

say "chain3 done"
