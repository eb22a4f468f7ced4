#!/usr/bin/env bash
# Watch the axon tunnel; the moment it answers, run the staged A/B sweep
# (tools/tpu_ab.sh) exactly once. ONE TPU client at a time — this watcher
# is the only TPU-touching process while it runs.
set -u
cd "$(dirname "$0")/.."
LOG="${1:-/tmp/tpu_ab.jsonl}"
STAMP=/tmp/tpu_watch_status
while true; do
  if timeout 120 python -c 'import sys, bench; sys.exit(0 if bench._backend_alive(100) is None else 1)' 2>/dev/null; then
    echo "up $(date -Is)" > "$STAMP"
    bash tools/tpu_ab.sh "$LOG"
    echo "sweep-done $(date -Is)" > "$STAMP"
    bash tools/tpu_train_distill.sh
    echo "train-done $(date -Is) rc=$?" > "$STAMP"
    exit 0
  fi
  echo "down $(date -Is)" > "$STAMP"
  sleep 600
done
