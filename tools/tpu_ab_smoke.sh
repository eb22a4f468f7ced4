#!/usr/bin/env bash
# CPU smoke of EVERY tpu_ab.sh leg at tiny size: each leg's exact env
# combo runs end-to-end (accel build, calibration, PSNR guards, student
# paths) so a real tunnel window is never burned on a crashing config.
# Usage: tools/tpu_ab_smoke.sh [out.jsonl]
set -u
LOG="${1:-/tmp/tpu_ab_smoke.jsonl}"
cd "$(dirname "$0")/.."
: > "$LOG"
fails=0
# Pull the leg table straight from the real sweep (single source of truth).
grep -E '^run [a-z]' tools/tpu_ab.sh | while read -r _ name envs; do
  # Overrides APPENDED so they win over the leg's own SIZE/RES settings
  # (env uses the last assignment); SAMPLES is kept when the leg sets one.
  extra="NERF_BENCH_PLATFORM=cpu NERF_BENCH_SIZE=16 NERF_BENCH_REPEATS=1 \
         NERF_BENCH_ACCEL_RES=16 NERF_BENCH_DEADLINE=0 NERF_BENCH_TRAIN_RAYS=256"
  case "$envs" in *NERF_BENCH_SAMPLES=*) ;; *) extra="$extra NERF_BENCH_SAMPLES=4,8";; esac
  out=$(timeout 900 env $envs $extra python bench.py 2>/tmp/ab_smoke_err.log)
  rc=$?
  if [ $rc -ne 0 ] || [ -z "$out" ]; then
    echo "{\"config\": \"$name\", \"error\": \"exit $rc\"}" >> "$LOG"
    echo "FAIL $name (rc=$rc)" >&2
    tail -3 /tmp/ab_smoke_err.log >&2
    fails=$((fails + 1))
  else
    echo "$out" | sed "s/^{/{\"config\": \"$name\", /" >> "$LOG"
    echo "ok $name" >&2
  fi
done
grep -c '"error"' "$LOG" >/dev/null 2>&1 && n_err=$(grep -c '"error"' "$LOG") || n_err=0
echo "smoke done -> $LOG ($n_err legs with error field)" >&2
exit 0
