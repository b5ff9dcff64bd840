#!/bin/bash
# TPU recovery watcher (VERDICT r2 #10 — the outage-survival pattern).
#
# Polls the chip with the subprocess tiny-matmul probe (90s timeout — the
# hard-outage mode hangs at backend init) every POLL_S seconds and EXITS 0
# the moment the chip answers. Run it in the background and queue your
# measurement scripts on its exit:
#
#   bash tools/wait_for_recovery.sh && python tools/profile_hippo_volume.py
#
# Never kill the axon relay; never probe while another process holds the TPU.
set -u
POLL_S="${POLL_S:-180}"
HERE="$(cd "$(dirname "$0")" && pwd)"
echo "watcher: polling every ${POLL_S}s (probe timeout 90s)"
while true; do
    if timeout 90 python "$HERE/tpu_probe.py"; then
        echo "watcher: TPU healthy at $(date -u +%FT%TZ)"
        exit 0
    fi
    echo "watcher: still down at $(date -u +%FT%TZ); sleeping ${POLL_S}s"
    sleep "$POLL_S"
done
