"""Hippocampus volume-batch sweep past 8 (VERDICT r4 next #9) — one process,
one TPU client; prints a row per vb."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402

for vb in (8, 12, 16, 24):
    t0 = time.perf_counter()
    try:
        out = bench.bench_sliding_window(
            bench.HIPPO, "hippo_vb_sweep", bench.A100_REFERENCE_VOL_PER_S,
            volume_batch=vb)
        print(f"| vb={vb} | {out['value']} vol/s | vs {out['vs_baseline']} | "
              f"({time.perf_counter()-t0:.0f}s)", flush=True)
    except Exception as e:
        print(f"| vb={vb} | FAIL {type(e).__name__}: {str(e)[:80]}",
              flush=True)
