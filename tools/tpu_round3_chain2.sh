#!/usr/bin/env bash
# Round-3 chain v2 — replaces tpu_round3_chain.sh after the schedule
# audit: the v1 hashgrid distill (64+128 samples, 16K batch) runs at
# ~556 rays/s on v5e (gather-bound) = ~60 h for 8000 steps, which would
# eat the whole round. v2 sizes every leg to the measured rates and
# front-loads the milestones:
#
#   1. student-128 distill resume -> 28 dB @ 400px -> export -> trained
#      benches (64+128 and 32+64; probe-culling defaults apply).
#   2. headline-variant mini-sweep + int8 speed legs (cheap, decisive).
#   3. hashgrid distill at the TPU preset (L=4 x F=8, 32+64 samples,
#      4096-ray batch: ~4x fewer gather rows AND the preset's quality
#      evidence in one run) -> trained-checkpoint bench.
#   4. QAT int8 student distill (--impl int8qat, evaluated with
#      --impl int8 — judged on the arithmetic it serves) -> int8 bench.
#   5. student continued toward 30 dB (VERDICT r1 item 4's bar).
#   6. teacher convergence with whatever window remains.
#
# Resumable everywhere (checkpoint resume + sweep skip-done).
set -u
cd "$(dirname "$0")/.."
LOG="${1:-/tmp/tpu_ab.jsonl}"
STATUS="${2:-/tmp/tpu_chain2.status}"
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_cache_tpu}"
export TPU_AB_NO_PROBE=1

say() { echo "$(date +%FT%T) $*" >> "$STATUS"; }
bench_leg() { # bench_leg <label> ENV=V...
  local label="$1"; shift
  local out
  out=$(env "$@" NERF_BENCH_LOCK_WAIT=2700 NERF_BENCH_DEADLINE=1500 \
        NERF_BENCH_SIZE=800 timeout 3000 python bench.py 2>>"$STATUS")
  if [ -n "$out" ]; then
    # Same config-labeled record shape as tpu_ab.sh legs (summarize_ab
    # keys on "config").
    echo "$out" | sed "s/^{/{\"config\": \"$label\", /" >> "$LOG"
    say "$label bench appended"
  else
    say "$label bench FAILED"
  fi
}

say "chain2 start"

# -- 1: student-128 to 28 dB + benches ----------------------------------
say "student-128 distill resume (target 28 dB)"
CONV_TRAIN_ARGS="--width 128 --v-width 64" CONV_TARGET_DB=28 \
  bash tools/tpu_convergence.sh /tmp/tpu_student >> "$STATUS" 2>&1
say "student distill done (rc=$?)"
if [ -d /tmp/tpu_student/exported ]; then
  bench_leg student_trained NERF_BENCH_WEIGHTS=/tmp/tpu_student/exported
  bench_leg student_trained_s32x64 \
    NERF_BENCH_WEIGHTS=/tmp/tpu_student/exported NERF_BENCH_SAMPLES=32,64
fi

# -- 2: cheap decisive legs ---------------------------------------------
say "headline variants + int8 speed legs"
TPU_AB_LEGS="off_probe_s2 off_probe_s6 off_probe_s4_thresh off_probe_s4_256 int8_800 int8_probe int8_student128 int8_student_s32x64 hashgrid_800 hashgrid_s32x64 hashgrid_s128x0" \
  TPU_AB_SKIP_DONE=1 bash tools/tpu_ab.sh "$LOG" >> "$STATUS" 2>&1
say "legs done (rc=$?)"

# -- 3: hashgrid distill at the TPU preset ------------------------------
say "hashgrid TPU-preset distill (L=4 F=8, 32+64, batch 4096)"
CONV_TRAIN_ARGS="--model hashgrid --hash-levels 4 --hash-features 8 --coarse-samples 32 --fine-samples 64" \
  CONV_BATCH=4096 CONV_TARGET_DB=27 CONV_MAX_STEPS=6000 \
  bash tools/tpu_convergence.sh /tmp/tpu_hashgrid >> "$STATUS" 2>&1
say "hashgrid distill done (rc=$?)"
hg_ckpt=$(ls -d /tmp/tpu_hashgrid/ckpts/step_* 2>/dev/null | sort | tail -1)
if [ -n "$hg_ckpt" ]; then
  bench_leg hashgrid_trained \
    NERF_BENCH_MODEL=hashgrid "NERF_BENCH_CHECKPOINT=$hg_ckpt" \
    NERF_BENCH_SAMPLES=32,64
fi

# -- 4: QAT int8 student -------------------------------------------------
say "QAT int8 student distill (impl=int8qat, eval impl=int8)"
CONV_TRAIN_ARGS="--width 128 --v-width 64 --impl int8qat" \
  CONV_EVAL_ARGS="--impl int8" CONV_TARGET_DB=28 CONV_MAX_STEPS=12000 \
  bash tools/tpu_convergence.sh /tmp/tpu_int8 >> "$STATUS" 2>&1
say "int8 distill done (rc=$?)"
if [ -d /tmp/tpu_int8/exported ]; then
  bench_leg int8_trained \
    NERF_BENCH_WEIGHTS=/tmp/tpu_int8/exported NERF_BENCH_IMPL=int8
  bench_leg int8_trained_s32x64 \
    NERF_BENCH_WEIGHTS=/tmp/tpu_int8/exported NERF_BENCH_IMPL=int8 \
    NERF_BENCH_SAMPLES=32,64
fi

# -- 5: student onward to 30 dB -----------------------------------------
say "student-128 continue (target 30 dB)"
CONV_TRAIN_ARGS="--width 128 --v-width 64" CONV_TARGET_DB=30 \
  CONV_MAX_STEPS=24000 \
  bash tools/tpu_convergence.sh /tmp/tpu_student >> "$STATUS" 2>&1
say "student 30 dB leg done (rc=$?)"
if [ -d /tmp/tpu_student/exported ]; then
  bench_leg student30_trained NERF_BENCH_WEIGHTS=/tmp/tpu_student/exported
fi

# -- 6: teacher convergence with the remaining window --------------------
say "teacher convergence resume (target 30 dB; runs until round end)"
bash tools/tpu_convergence.sh /tmp/tpu_convergence >> "$STATUS" 2>&1
say "teacher convergence done (rc=$?)"

say "chain2 done"
