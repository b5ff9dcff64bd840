#!/usr/bin/env bash
# TPU-outage recovery watcher (VERDICT r2 next #10).
#
# The single v5e chip behind the axon relay has a documented hang-at-init
# outage mode lasting 15 min - 6.5 h (NOTES_ROUND2.md).  This watcher polls
# with a bounded tiny-matmul probe and runs a queued command list exactly
# once when the chip comes back, so an outage never strands a round's
# measurements again.
#
# Usage:
#   tools/tpu_recovery_watcher.sh [queue_file]
#     queue_file: a shell script to exec on recovery
#                 (default /tmp/on_recovery.sh)
#   nohup tools/tpu_recovery_watcher.sh /tmp/on_recovery.sh \
#       > /tmp/recovery_watch.log 2>&1 & echo $! > /tmp/recovery_watch.pid
#
# The probe runs in a subprocess with a hard timeout: a hung chip hangs the
# CLIENT at its first compile (it does not error), so the parent process
# must never touch the device itself.

set -u
QUEUE="${1:-/tmp/on_recovery.sh}"
PROBE_TIMEOUT="${PROBE_TIMEOUT:-90}"
POLL_SECONDS="${POLL_SECONDS:-120}"

probe() {
  timeout "${PROBE_TIMEOUT}" python - <<'EOF'
import jax, jax.numpy as jnp
x = jnp.ones((128, 128), jnp.bfloat16)
y = (x @ x).sum()
assert jax.devices()[0].platform == "tpu", jax.devices()
print("probe ok:", float(y))
EOF
}

echo "[watcher] polling every ${POLL_SECONDS}s (probe timeout ${PROBE_TIMEOUT}s); queue: ${QUEUE}"
while true; do
  if probe; then
    echo "[watcher] chip healthy at $(date -u +%FT%TZ)"
    if [ -f "${QUEUE}" ]; then
      echo "[watcher] running queued work: ${QUEUE}"
      bash "${QUEUE}"
      rc=$?
      echo "[watcher] queue done (rc=${rc})"
      mv "${QUEUE}" "${QUEUE}.done" 2>/dev/null || true
    else
      echo "[watcher] no queue file; exiting"
    fi
    exit 0
  fi
  echo "[watcher] chip down at $(date -u +%FT%TZ); retry in ${POLL_SECONDS}s"
  sleep "${POLL_SECONDS}"
done
