#!/usr/bin/env bash
# Round-end guard (VERDICT r3 item 1b): guarantees the driver's
# end-of-round `python bench.py` finds the TPU lock free.
#
#   tools/round_guard.sh set <hours>   write /tmp/nerf_round_deadline
#                                      (epoch secs, now + hours)
#   tools/round_guard.sh status        print time left
#   tools/round_guard.sh clear         remove the deadline
#
# Contract all TPU chain scripts follow (tpu_convergence.sh, round-4
# chain): before STARTING any leg or chunk, check the deadline file; if
# past, exit cleanly. Legs themselves are bounded (<=30 min flock window
# + `timeout`), so the lock is provably free within one leg-length of the
# deadline. The deadline should therefore be set >=45 min before the
# expected round end.
set -u
FILE=/tmp/nerf_round_deadline
case "${1:-status}" in
  set)
    hours="${2:?usage: round_guard.sh set <hours>}"
    deadline=$(python3 -c "import time; print(int(time.time() + float('$hours')*3600))")
    echo "$deadline" > "$FILE"
    echo "round deadline set: $(date -d @"$deadline" +%FT%T) (${hours}h from now)"
    ;;
  status)
    if [ -f "$FILE" ]; then
      left=$(( $(cat "$FILE") - $(date +%s) ))
      echo "deadline $(date -d @"$(cat "$FILE")" +%FT%T): ${left}s left"
    else
      echo "no deadline set"
    fi
    ;;
  clear) rm -f "$FILE"; echo "deadline cleared" ;;
  *) echo "usage: round_guard.sh {set <hours>|status|clear}" >&2; exit 2 ;;
esac
