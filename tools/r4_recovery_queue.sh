#!/bin/bash
# Round-4 packed-conv decision chain — runs once when the chip recovers.
cd /root/repo
echo "=== packed scan $(date -u +%FT%TZ)" >> /tmp/recovery_queue_done
timeout 3000 python tools/ct_stage_scan.py packed --n 8 2>&1 | tee results/r4/stage_scan_packed.log
echo "packed scan rc=$?" >> /tmp/recovery_queue_done
echo "=== ct e2e blocked A/B $(date -u +%FT%TZ)" >> /tmp/recovery_queue_done
LNN_BLOCKED_CONV=1 timeout 1800 python bench.py --workload ct 2>&1 | tee results/r4/bench_ct_blocked.log
echo "ct blocked rc=$?" >> /tmp/recovery_queue_done
LNN_BLOCKED_CONV=1 timeout 1800 python bench.py --workload train_mfu 2>&1 | tee results/r4/bench_train_blocked.log
echo "train blocked rc=$?" >> /tmp/recovery_queue_done
echo "=== done $(date -u +%FT%TZ)" >> /tmp/recovery_queue_done
