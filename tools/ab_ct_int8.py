"""A/B: mixed-precision int8 inference at CT scale (VERDICT r2 #4).

Back-to-back on an idle host: the default TPU inference path (Pallas fused
conv for eligible C<=64 lane-aligned stages, XLA bf16 elsewhere) vs the same
path with stages of min(Cin,Cout) >= --int8_min quantized to int8
(models/unet._int8_conv; scales cancel exactly through InstanceNorm).
Reports per-volume time and the voxel-level segmentation agreement between
the two paths (the quantization-fidelity check: 8-bit rounding is the only
numerical difference).

Round-2 context (RESULTS.md): standalone XLA int8 conv was 1.65x at C=64 but
SLOWER at C=32 — hence the per-stage gate rather than whole-model int8.

Usage: python tools/ab_ct_int8.py [--int8_min 64] [--vols 2]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PATCH = (128, 128, 128)
VOLUME = (384, 384, 192)
CLASSES = 3
POOLS = 5


def build(int8_min: int):
    from lifelong_nnunet_tpu.models.unet import GenericUNet, maybe_pallas_conv
    model = maybe_pallas_conv(GenericUNet(
        num_classes=CLASSES, pool_op_kernel_sizes=((2, 2, 2),) * POOLS,
        conv_kernel_sizes=((3, 3, 3),) * (POOLS + 1), base_num_features=32,
        max_num_features=320, dtype=jnp.bfloat16))
    if int8_min:
        model = model.clone(int8_min_ch=int8_min)
    return model


def run_path(model, params, vols, window_batch=2):
    from lifelong_nnunet_tpu.inference.sliding_window import (
        predict_sliding_window_multi)
    apply_fn = lambda p, x: model.apply({"params": p}, x)
    predict_sliding_window_multi(apply_fn, params, vols[:1], PATCH, CLASSES,
                                 mirror_axes=(0, 1, 2),
                                 window_batch=window_batch, output="seg")
    t0 = time.perf_counter()
    segs = predict_sliding_window_multi(apply_fn, params, vols, PATCH, CLASSES,
                                        mirror_axes=(0, 1, 2),
                                        window_batch=window_batch, output="seg")
    dt = (time.perf_counter() - t0) / len(vols)
    return segs, dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--int8_min", type=int, default=64)
    ap.add_argument("--vols", type=int, default=2)
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"backend={jax.default_backend()} int8_min={args.int8_min}")

    base = build(0)
    params = jax.device_put(base.init(
        jax.random.PRNGKey(0), jnp.zeros((1,) + PATCH + (1,)))["params"])
    rng = np.random.RandomState(0)
    vols = [rng.normal(size=VOLUME + (1,)).astype(np.float32)
            for _ in range(args.vols)]

    segs_a, dt_a = run_path(base, params, vols)
    segs_b, dt_b = run_path(build(args.int8_min), params, vols)
    agree = float(np.mean([np.mean(a == b) for a, b in zip(segs_a, segs_b)]))
    print(f"bf16/pallas path : {dt_a:6.1f} s/vol = {1 / dt_a:.3f} vol/s")
    print(f"+int8 (C>={args.int8_min:3d})   : {dt_b:6.1f} s/vol = "
          f"{1 / dt_b:.3f} vol/s  ({dt_a / dt_b:.2f}x)")
    print(f"seg agreement    : {agree * 100:.2f}% of voxels")


if __name__ == "__main__":
    main()
