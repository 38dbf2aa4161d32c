#!/bin/bash
# Touch /tmp/stop_queue as soon as part A's tiny720 training job (the
# exp_prvnet_r4 process) is observed running, so run_r4_session2.sh exits
# after tiny720 completes and run_r4_session2b.sh (label top-up -> mode-7
# -> atto -> mode-21) takes over the chip.  Read-only /proc scan; never
# kills anything.  Safe to run repeatedly; exits once the flag is set.
set -u
# part A's PID (or a pidfile containing it) MUST be passed in — a
# hardcoded PID from a dead session would make the watcher exit instantly
# as "part A gone" without ever setting the flag (advisor r4)
if [ $# -lt 1 ]; then
  echo "usage: $0 <partA-pid | partA-pidfile>" >&2
  exit 2
fi
PARTA="$1"
if [ -f "$PARTA" ]; then PARTA=$(cat "$PARTA"); fi
case "$PARTA" in
  ''|*[!0-9]*) echo "[watcher] invalid part-A PID: '$PARTA'" >&2; exit 2 ;;
esac
seen_prvnet() {
  for d in /proc/[0-9]*; do
    p=${d#/proc/}
    [ "$p" = "$$" ] && continue
    if tr '\0' ' ' < "$d/cmdline" 2>/dev/null | grep -q "exp_prvnet_r4"; then
      return 0
    fi
  done
  return 1
}
while true; do
  if [ -e /tmp/stop_queue ]; then
    echo "[watcher] stop_queue already present $(date +%H:%M:%S)"
    exit 0
  fi
  if seen_prvnet; then
    touch /tmp/stop_queue
    echo "[watcher] tiny720 job observed -> stop_queue set $(date +%H:%M:%S)"
    exit 0
  fi
  # if part A is gone entirely (failed or finished), part B takes over on
  # its own; nothing to do
  if ! ps -p "$PARTA" > /dev/null 2>&1; then
    echo "[watcher] part A ($PARTA) gone; exiting $(date +%H:%M:%S)"
    exit 0
  fi
  sleep 30
done
