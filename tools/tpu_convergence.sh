#!/usr/bin/env bash
# Training-convergence milestone run (VERDICT r1 item 4): distill the
# pretrained lego teacher into freshly initialized networks on TPU until
# `evaluate` reports >= $TARGET_DB PSNR vs the teacher at EVAL_SIZE^2 on
# the held-out golden camera (training views are random hemisphere
# samples — data.py:DistillationDataset — so this measures
# generalization, not memorization). Then export the student to the
# reference .bin format and verify the export loads + renders.
#
# Runs in chunks with checkpoint/resume (cli.py resumes from the latest
# checkpoint in --checkpoint-dir), so an interrupted run continues where
# it stopped. ONE TPU client at a time — do not run alongside bench.
set -u
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/tpu_convergence}"
LOG="$OUT/run.log"
CKPT="$OUT/ckpts"
CHUNK="${CONV_CHUNK:-1000}"  # 2000-step chunks at f32/16K rays measured
#                              ~1.5 s/step wall on the tunneled v5e — past
#                              the 1800 s lock window; 1000 fits with slack
# All TPU invocations serialize on the same flock bench.py takes, so a
# driver-launched bench waits for an in-flight chunk instead of racing it
# (two concurrent clients can wedge the tunnel). Chunks are sized to hold
# the lock <=30 min.
LOCK="${NERF_TPU_LOCK:-/tmp/nerf_tpu.lock}"
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_cache_tpu}"
TPU="flock -w 1800 $LOCK"
MAX_STEPS="${CONV_MAX_STEPS:-24000}"
TARGET_DB="${CONV_TARGET_DB:-30.0}"
EVAL_SIZE="${CONV_EVAL_SIZE:-400}"
# Extra `train` args, e.g. a student arch: "--width 128 --v-width 64"
# (evaluate/export infer the arch from the checkpoint — no flags needed).
TRAIN_ARGS="${CONV_TRAIN_ARGS:-}"
mkdir -p "$OUT" "$CKPT"

echo "$(date +%FT%T) convergence run -> $OUT (chunk $CHUNK, max $MAX_STEPS, target ${TARGET_DB} dB @ ${EVAL_SIZE}px)" | tee -a "$LOG"

steps=0
psnr="0"
while [ "$steps" -lt "$MAX_STEPS" ]; do
  # Round-end guard (round-3 post-mortem: a convergence chain held the TPU
  # flock in back-to-back <=30-min chunks until the driver's end-of-round
  # bench starved at rc=124). If /tmp/nerf_round_deadline (epoch seconds,
  # written by tools/round_guard.sh) is in the past, stop cleanly —
  # progress is checkpointed and a later run resumes.
  if [ -f /tmp/nerf_round_deadline ] && \
     [ "$(date +%s)" -ge "$(cat /tmp/nerf_round_deadline)" ]; then
    echo "round deadline passed — stopping before the next chunk (resume later)" | tee -a "$LOG"
    break
  fi
  steps=$((steps + CHUNK))
  echo "=== train to step $steps ($(date +%H:%M:%S)) ===" | tee -a "$LOG"
  $TPU timeout 1800 python -m nerf_rs_tpu train $TRAIN_ARGS \
    --batch-rays "${CONV_BATCH:-16384}" \
    --steps "$steps" --checkpoint-dir "$CKPT" \
    --checkpoint-every 1000 --log-every 200 >> "$LOG" 2>&1
  rc=$?
  if [ $rc -eq 124 ]; then
    # `timeout` SIGTERMs the trainer, which checkpoints gracefully and
    # exits 0 — but timeout still reports 124. Progress is preserved:
    # resync the step counter to the latest checkpoint and keep going
    # instead of abandoning the run (the round-2 behavior lost a whole
    # convergence run to one slow chunk).
    echo "train chunk hit the chunk timeout — resuming from latest checkpoint" | tee -a "$LOG"
  elif [ $rc -ne 0 ]; then
    echo "train chunk failed (rc=$rc)" | tee -a "$LOG"
    tail -5 "$LOG" >&2
    exit 1
  fi
  latest=$(ls -d "$CKPT"/step_* 2>/dev/null | sort | tail -1 | grep -oE '[0-9]+$' || true)
  if [ -n "${latest:-}" ]; then
    if [ "$((10#$latest))" -le "${prev_steps:-0}" ]; then
      # No forward progress this chunk (compile ate the window / wedge):
      # bail instead of looping on the same checkpoint forever.
      echo "no progress past step ${prev_steps:-0} this chunk — aborting" | tee -a "$LOG"
      exit 1
    fi
    steps=$((10#$latest))   # actual progress, not the requested target
  fi
  prev_steps=$steps
  echo "=== evaluate @ step $steps ===" | tee -a "$LOG"
  # CONV_EVAL_ARGS: extra evaluate flags — e.g. "--impl int8" so a QAT
  # distill is judged on the arithmetic it will actually serve.
  ev=$($TPU timeout 1200 python -m nerf_rs_tpu evaluate \
       --checkpoint-dir "$CKPT" --size "$EVAL_SIZE" \
       ${CONV_EVAL_ARGS:-} 2>>"$LOG")
  echo "$ev" | tee -a "$LOG"
  psnr=$(echo "$ev" | grep -oE 'PSNR vs teacher [0-9.]+' | grep -oE '[0-9.]+$')
  [ -z "$psnr" ] && psnr=0
  if python -c "import sys; sys.exit(0 if float('$psnr') >= float('$TARGET_DB') else 1)"; then
    echo "TARGET REACHED: ${psnr} dB >= ${TARGET_DB} dB at step $steps" | tee -a "$LOG"
    break
  fi
done

ckpt=$(ls -d "$CKPT"/step_* 2>/dev/null | sort | tail -1)
case "$TRAIN_ARGS" in *hashgrid*)
  # Hash-grid checkpoints have no reference .bin equivalent (cli export
  # guards this) — the quality number above is the deliverable.
  echo "{\"final_psnr_db\": $psnr, \"steps\": $steps, \"target_db\": $TARGET_DB, \"eval_size\": $EVAL_SIZE}" \
    | tee "$OUT/summary.json" | tee -a "$LOG"
  exit 0
;; esac
echo "=== export $ckpt -> reference .bin format ===" | tee -a "$LOG"
$TPU timeout 600 python -m nerf_rs_tpu export --checkpoint "$ckpt" -o "$OUT/exported" >> "$LOG" 2>&1 \
  && echo "export ok" | tee -a "$LOG"
# The golden tolerances belong to the TEACHER weights; for the student
# export the verification that matters is: the .bin bundle round-trips
# through the reference-format loader and renders the same image as the
# checkpoint params (allclose at render level).
$TPU timeout 1200 python - "$OUT/exported" "$ckpt" >> "$LOG" 2>&1 <<'EOF' \
  && echo "export render-parity ok" | tee -a "$LOG"
import sys
import jax, numpy as np
from nerf_rs_tpu.config import RenderConfig
from nerf_rs_tpu.io.weights import find_lego_assets, load_nerf_params
from nerf_rs_tpu.io.checkpoint import restore_params
from nerf_rs_tpu.io.golden import camera_from_golden, load_golden
from nerf_rs_tpu.render import render_image

exported, ckpt = sys.argv[1], sys.argv[2]
params = {
    "coarse": load_nerf_params(f"{exported}/coarse"),
    "fine": load_nerf_params(f"{exported}/fine"),
}
ck_params, _ = restore_params(ckpt)   # template-free: any ArchConfig member
ck_params = jax.device_put(ck_params)
golden = load_golden(find_lego_assets() / "tf_reference_samples.json")
cam = camera_from_golden(golden)
cfg = RenderConfig()
key = jax.random.key(0)
a = np.asarray(render_image(params["coarse"], params["fine"], cam, 64, 64, key, cfg))
b = np.asarray(render_image(ck_params["coarse"], ck_params["fine"], cam, 64, 64, key, cfg))
err = float(np.abs(a - b).max())
print(f"export render parity: max abs err {err:.2e}")
assert err < 1e-4, err
EOF

echo "{\"final_psnr_db\": $psnr, \"steps\": $steps, \"target_db\": $TARGET_DB, \"eval_size\": $EVAL_SIZE}" \
  | tee "$OUT/summary.json" | tee -a "$LOG"
