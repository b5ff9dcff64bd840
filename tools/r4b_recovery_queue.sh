#!/bin/bash
# Round-4 conv25d decision chain — runs once when the chip recovers.
cd /root/repo
echo "=== upT25d scan $(date -u +%FT%TZ)" >> /tmp/recovery_queue_done
timeout 1800 python tools/ct_stage_scan.py conv25dx --sections b --n 6 > results/r4/stage_scan_upT25d.log 2>&1
echo "upT25d rc=$?" >> /tmp/recovery_queue_done
echo "=== fwd A/B $(date -u +%FT%TZ)" >> /tmp/recovery_queue_done
timeout 1200 python tools/ab_forward_conv25d.py 4 > results/r4/ab_fwd_conv25d2.log 2>&1
echo "fwd ab rc=$?" >> /tmp/recovery_queue_done
echo "=== ct e2e $(date -u +%FT%TZ)" >> /tmp/recovery_queue_done
LNN_CONV25D=1 timeout 2400 python tools/ab_ct_window_batch.py 4 --pallas > results/r4/wb_conv25d2.log 2>&1
echo "ct e2e rc=$?" >> /tmp/recovery_queue_done
echo "=== train bench A/B $(date -u +%FT%TZ)" >> /tmp/recovery_queue_done
LNN_CONV25D=0 timeout 1800 python bench.py --workload train_mfu > results/r4/bench_train_base.log 2>&1
echo "train base rc=$?" >> /tmp/recovery_queue_done
LNN_CONV25D=1 timeout 1800 python bench.py --workload train_mfu > results/r4/bench_train_25d.log 2>&1
echo "train 25d rc=$?" >> /tmp/recovery_queue_done
echo "=== done $(date -u +%FT%TZ)" >> /tmp/recovery_queue_done
echo "=== conv2d regime scan $(date -u +%FT%TZ)" >> /tmp/recovery_queue_done
timeout 1800 python tools/ct_stage_scan.py conv2d --n 6 > results/r4/stage_scan_conv2d.log 2>&1
echo "conv2d scan rc=$?" >> /tmp/recovery_queue_done
