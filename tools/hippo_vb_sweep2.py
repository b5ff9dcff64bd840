"""Hippocampus vb sweep round 2: volume count a multiple of every vb (the
round-1 sweep padded partial groups with repeated volumes — wasted compute
counted against wall time, so vb>8 was UNDERestimated)."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402

cfg = dict(bench.HIPPO, timed=48)
for vb in (8, 16, 24, 48):
    t0 = time.perf_counter()
    try:
        out = bench.bench_sliding_window(
            cfg, "hippo_vb_sweep2", bench.A100_REFERENCE_VOL_PER_S,
            volume_batch=vb)
        print(f"| vb={vb} | {out['value']} vol/s | vs {out['vs_baseline']} | "
              f"({time.perf_counter()-t0:.0f}s)", flush=True)
    except Exception as e:
        print(f"| vb={vb} | FAIL {type(e).__name__}: {str(e)[:80]}",
              flush=True)
