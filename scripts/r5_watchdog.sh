#!/bin/bash
# Watchdog for the round-5 chip queue (scripts/r5_queue.sh).
#
# Failure mode it handles (seen 3x on 2026-08-20, and once in the r5
# soak's segment 4): a chip client's remote-compile/claim RPC is dropped
# by the axon relay and the python process futex-waits FOREVER with flat
# utime — each hang would otherwise burn its full step_ab/cli timeout
# (80-120 min). SIGKILL + the queue's `|| echo FAIL` / idempotent-resume
# structure recovers in seconds, so killing early converts a lost session
# into a lost leg.
#
# Safety rules:
#   - ONLY descendants of the given queue-root PID are ever touched
#     (never a pattern match over the whole process table — the build
#     session's own command lines could match one).
#   - A python is killed only after its utime has been FLAT for
#     >= THRESH seconds while the main thread sits in futex_do_wait.
#     Legit cold remote compiles have been observed up to ~850 s of
#     futex-wait; THRESH=1500 stays safely above that.
#
# Usage: setsid bash scripts/r5_watchdog.sh <queue_root_pid> \
#          > /tmp/r5_watchdog.log 2>&1 &
set -u
ROOT=${1:?queue root pid}
THRESH=${2:-1500}
POLL=60

declare -A UT T0

descendants() {  # echo all descendant pids of $1 (children, recursively)
  local q=("$1") out=() p kids
  while [ ${#q[@]} -gt 0 ]; do
    p=${q[0]}; q=("${q[@]:1}")
    kids=$(ps -o pid= --ppid "$p" 2>/dev/null)
    for k in $kids; do out+=("$k"); q+=("$k"); done
  done
  echo "${out[@]:-}"
}

echo "watchdog armed on root $ROOT (thresh ${THRESH}s)"
while kill -0 "$ROOT" 2>/dev/null; do
  now=$(date +%s)
  for p in $(descendants "$ROOT"); do
    comm=$(cat /proc/$p/comm 2>/dev/null) || continue
    [ "$comm" = "python" ] || [ "$comm" = "python3" ] || continue
    ut=$(awk '{print $14+$15}' /proc/$p/stat 2>/dev/null) || continue
    wchan=$(cat /proc/$p/wchan 2>/dev/null)
    # NEAR-flat, not exactly flat: hung clients keep a heartbeat thread
    # that creeps utime ~5 jiffies/min (observed on both 2026-08-20
    # hangs), so an equality test never fires. Real work burns >100
    # jiffies/min even during remote compiles (the host side spins on
    # serialization); < 10 jiffies per 60 s poll = effectively idle.
    prev=${UT[$p]:-}
    if [ -n "$prev" ] && [ $((ut - prev)) -lt 10 ] && \
       [ "$wchan" = "futex_do_wait" ]; then
      UT[$p]=$ut
      if [ $((now - ${T0[$p]:-$now})) -ge "$THRESH" ]; then
        echo "$(date -u +%H:%M:%S) KILL $p (utime flat ${THRESH}s+ in" \
             "futex_do_wait): $(tr '\0' ' ' < /proc/$p/cmdline | cut -c1-160)"
        kill -9 "$p"
        unset "UT[$p]" "T0[$p]"
      fi
    else
      UT[$p]=$ut; T0[$p]=$now
    fi
  done
  sleep "$POLL"
done
echo "watchdog exit: queue root $ROOT gone"
