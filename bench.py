"""Benchmark: Gaussian sliding-window 3d_fullres inference throughput
(volumes/sec/chip) — BASELINE.json's primary metric.

Workload: Task04_Hippocampus-scale geometry (the reference's smallest
headline config): volume padded to a 2x2x2 window grid over a (40,56,40)
patch, full 8-way mirroring TTA, Gaussian-weighted accumulation, bf16
compute / fp32 accumulation, all fused into one jitted program with windows
batched for the MXU.

``vs_baseline`` compares against the PyTorch reference's estimated A100
throughput for the same workload (nnU-Net v1 sliding window + TTA at
hippocampus scale ~= 6 volumes/s on A100 — no number is checked into the
reference repo, see BASELINE.md; this constant documents our assumption).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np

A100_REFERENCE_VOL_PER_S = 6.0

PATCH = (40, 56, 40)
VOLUME = (60, 84, 60)        # -> 2x2x2 window grid at step 0.5
NUM_CLASSES = 3
WARMUP_VOLS = 3
TIMED_VOLS = 30


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from lifelong_nnunet_tpu.inference.sliding_window import (
        predict_sliding_window, predict_sliding_window_multi)
    from lifelong_nnunet_tpu.models.unet import GenericUNet

    backend = jax.default_backend()
    model = GenericUNet(
        num_classes=NUM_CLASSES,
        pool_op_kernel_sizes=((2, 2, 2), (2, 2, 2), (2, 2, 2)),
        conv_kernel_sizes=((3, 3, 3),) * 4,
        base_num_features=32, max_num_features=320,
        dtype=jnp.bfloat16 if backend != "cpu" else jnp.float32,
    )
    rng = np.random.RandomState(0)
    vols = [rng.normal(size=VOLUME + (1,)).astype(np.float32)
            for _ in range(TIMED_VOLS)]
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1,) + PATCH + (1,)))["params"]
    params = jax.device_put(params)
    apply_fn = lambda p, x: model.apply({"params": p}, x)

    # serving path: device-side argmax, bf16 upload, depth-2 dispatch pipeline
    def run(stream):
        return predict_sliding_window_multi(
            apply_fn, params, stream, PATCH, NUM_CLASSES,
            mirror_axes=(0, 1, 2), window_batch=8, output="seg")

    run(vols[:WARMUP_VOLS])
    t0 = time.perf_counter()
    segs = run(vols)
    dt = time.perf_counter() - t0
    assert segs[0].shape == VOLUME and segs[-1].dtype == np.uint8
    vps = TIMED_VOLS / dt

    print(json.dumps({
        "metric": "sliding_window_3d_fullres_hippocampus_tta8",
        "value": round(vps, 3),
        "unit": "volumes/sec/chip",
        "vs_baseline": round(vps / A100_REFERENCE_VOL_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
