#!/usr/bin/env bash
# Tunnel watcher: probe the axon TPU backend every $INTERVAL seconds and
# launch tools/tpu_ab.sh the moment it answers. Designed to run inside a
# tmux session during outages so the staged A/B sweep (PLAN.md) starts
# unattended the instant the tunnel recovers. Appends status lines to
# $STATUS so a supervisor can poll progress cheaply.
set -u
cd "$(dirname "$0")/.."
LOG="${1:-/tmp/tpu_ab.jsonl}"
STATUS="${2:-/tmp/tpu_watch.status}"
INTERVAL="${TPU_WATCH_INTERVAL:-300}"

probe() {
  timeout 120 python -c \
    'import sys, bench; sys.exit(0 if bench._backend_alive(100) is None else 1)' \
    >/dev/null 2>&1
}

echo "$(date +%FT%T) watcher start (interval ${INTERVAL}s)" >> "$STATUS"
while true; do
  if probe; then
    echo "$(date +%FT%T) tunnel UP -> running tpu_ab.sh" >> "$STATUS"
    bash tools/tpu_ab.sh "$LOG" >> "$STATUS" 2>&1
    echo "$(date +%FT%T) sweep finished (rc=$?)" >> "$STATUS"
    if [ "${TPU_WATCH_CONVERGENCE:-1}" = "1" ]; then
      echo "$(date +%FT%T) starting convergence run" >> "$STATUS"
      bash tools/tpu_convergence.sh /tmp/tpu_convergence >> "$STATUS" 2>&1
      echo "$(date +%FT%T) convergence finished (rc=$?)" >> "$STATUS"
    fi
    exit 0
  fi
  echo "$(date +%FT%T) tunnel down" >> "$STATUS"
  sleep "$INTERVAL"
done
