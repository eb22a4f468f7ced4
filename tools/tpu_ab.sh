#!/usr/bin/env bash
# Sequential TPU A/B sweep of the PLAN.md perf backlog. ONE TPU client at
# a time (the tunneled chip serializes clients; parallel runs wedge it).
# Each config is a fresh process under `timeout`; results append as JSON
# lines to $1 (default /tmp/tpu_ab.jsonl). Safe to re-run; it probes the
# tunnel first and exits 2 if the backend is down.
set -u
LOG="${1:-/tmp/tpu_ab.jsonl}"
cd "$(dirname "$0")/.."

probe() {
  timeout 120 python - <<'EOF'
import threading, sys
ok = {}
def p():
    import jax
    try:
        jax.devices(); ok["y"] = True
    except Exception:
        pass
t = threading.Thread(target=p, daemon=True); t.start(); t.join(100)
sys.exit(0 if "y" in ok else 1)
EOF
}

if ! probe; then
  echo "tunnel down" >&2
  exit 2
fi

run() {
  local name="$1"; shift
  echo "=== $name ($(date +%H:%M:%S)) ===" >&2
  local out
  out=$(timeout 1800 env "$@" NERF_BENCH_INIT_TIMEOUT=240 python bench.py 2>/tmp/tpu_ab_stderr.log)
  local rc=$?
  if [ $rc -ne 0 ] || [ -z "$out" ]; then
    echo "{\"config\": \"$name\", \"error\": \"exit $rc\"}" >> "$LOG"
    tail -3 /tmp/tpu_ab_stderr.log >&2
  else
    echo "$out" | sed "s/^{/{\"config\": \"$name\", /" >> "$LOG"
  fi
  tail -1 "$LOG" >&2
}

# Render-mode ladder (smaller first: compile cache warms, failures surface fast)
run base_800            NERF_BENCH_SIZE=800
run interleave_800      NERF_BENCH_SIZE=800 NERF_FUSED_INTERLEAVE=1
run psampling_800       NERF_BENCH_SIZE=800 NERF_BENCH_SAMPLING=pallas
run accel_800           NERF_BENCH_SIZE=800 NERF_BENCH_ACCEL=1
# Winner combos
run accel_interleave    NERF_BENCH_SIZE=800 NERF_BENCH_ACCEL=1 NERF_FUSED_INTERLEAVE=1
run accel_psampling     NERF_BENCH_SIZE=800 NERF_BENCH_ACCEL=1 NERF_BENCH_SAMPLING=pallas
# Train mode
run train               NERF_BENCH_MODE=train
run train_accel         NERF_BENCH_MODE=train NERF_BENCH_ACCEL=1
echo "done -> $LOG" >&2
