#!/bin/bash
# Round-4 chip queue: CT effective-batch sweeps (VERDICT r3 next #1).
# Order by decisiveness: e2e window-batch arms first, then per-stage curves.
cd /root/repo
R=results/r4
echo "=== queue start $(date -u +%H:%M:%SZ) ===" >> $R/chip_queue.log
timeout 1800 python tools/ab_ct_window_batch.py 2 4 8 >> $R/wb_xla.log 2>&1
echo "wb_xla rc=$? $(date -u +%H:%M:%SZ)" >> $R/chip_queue.log
timeout 1800 python tools/ab_ct_window_batch.py 2 4 8 --pallas >> $R/wb_pallas.log 2>&1
echo "wb_pallas rc=$? $(date -u +%H:%M:%SZ)" >> $R/chip_queue.log
timeout 2400 python tools/ab_ct_batch.py --batches 1 2 4 8 >> $R/ab_ct_batch_full.log 2>&1
echo "ab_ct_batch rc=$? $(date -u +%H:%M:%SZ)" >> $R/chip_queue.log
echo "=== queue done $(date -u +%H:%M:%SZ) ===" >> $R/chip_queue.log
