"""CT-scale inference roofline (VERDICT r2 #4): a FLOP-weighted lane-ceiling
analysis for the 5-pool 128^3 CT topology, mirroring the hippocampus roofline
in RESULTS.md, plus (on a healthy chip) a stage-split measurement so the CT
vol/s number has a denominator.

The structural model (same as the hippocampus roofline): a conv with
Cout < 128 can use only Cout/128 of the MXU output lanes, so the achievable
fraction of peak is the FLOP-weighted HARMONIC mean of per-op lane ceilings
(time adds, not throughput):  ceiling = 1 / sum(share_i / lane_i).

Usage:
  python tools/ct_roofline.py             # analytic census only (no chip)
  python tools/ct_roofline.py --measure   # + on-chip stage split
"""
from __future__ import annotations

import argparse
import math
import os
import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PATCH = (128, 128, 128)
VOLUME = (384, 384, 192)
CLASSES = 3
POOLS = 5
BASE, FMAX = 32, 320
PEAK_V5E = 197e12


def conv_census(pools: int = POOLS, patch=PATCH, classes: int = CLASSES):
    """Enumerate every conv in GenericUNet(pools) on a `patch` input and
    return [(name, out_voxels, cin, cout, k3, flops)] — mirrors
    models/unet.py::GenericUNet.__call__ exactly (2 convs/stage, strided
    first conv per encoder stage, transpose-conv ups, concat skips,
    1x1 seg heads)."""
    feats = lambda s: min(BASE * (2 ** s), FMAX)
    vox = lambda s: math.prod(p // (2 ** s) for p in patch)
    ops = []

    def conv(name, v, cin, cout, k3=27):
        ops.append((name, v, cin, cout, k3, 2.0 * v * cin * cout * k3))

    # encoder (stage s output res = patch / 2^s; stride lives in block0)
    for s in range(pools):
        conv(f"enc{s}.b0", vox(s), 1 if s == 0 else feats(s - 1), feats(s))
        conv(f"enc{s}.b1", vox(s), feats(s), feats(s))
    conv("bott.b0", vox(pools), feats(pools - 1), feats(pools))
    conv("bott.b1", vox(pools), feats(pools), feats(pools))
    # decoder: d = 0 is deepest
    for d in range(pools):
        s_skip = pools - 1 - d
        f = feats(s_skip)
        # transpose conv stride=kernel=2: each output voxel touched once
        conv(f"up{d}", vox(s_skip), feats(pools) if d == 0 else feats(s_skip + 1),
             f, k3=1)
        conv(f"dec{d}.b0", vox(s_skip), 2 * f, f)
        conv(f"dec{d}.b1", vox(s_skip), f, f)
        conv(f"seg{d}", vox(s_skip), f, classes, k3=1)
    return ops


def lane_ceiling_table(ops):
    buckets = defaultdict(float)
    total = sum(op[-1] for op in ops)
    for _, _, _, cout, _, fl in ops:
        buckets[min(cout, 128) / 128.0 if cout >= 8 else cout / 128.0] += fl
    # group by Cout width for the printed table
    by_c = defaultdict(float)
    for _, _, _, cout, _, fl in ops:
        by_c[cout] += fl
    print(f"per-window forward FLOPs (analytic): {total / 1e12:.3f} TFLOP")
    print("| Cout | share of FLOPs | lane ceiling |")
    print("|---|---|---|")
    inv = 0.0
    for cout in sorted(by_c):
        share = by_c[cout] / total
        lane = min(cout, 128) / 128.0
        inv += share / lane
        print(f"| {cout} | {share * 100:.1f}% | {lane * 100:.0f}% |")
    ceiling = 1.0 / inv
    print(f"FLOP-weighted structural ceiling: {ceiling * 100:.1f}% of peak "
          f"= {ceiling * PEAK_V5E / 1e12:.1f} TFLOP/s on v5e")
    return total, ceiling


def train_ceiling_table(ops):
    """Analytic TRAIN-step lane ceiling (denominator for bench.py's
    train_step_ct128_mfu, the VERDICT-r2 'MFU is 5.2%' line).

    Per conv the backward adds: a full forward RECOMPUTE (bench trains with
    remat — XLA's cost analysis counts those FLOPs, so the bench MFU
    numerator does too), dx (a conv whose OUTPUT channels are Cin, so its
    MXU lane ceiling keys on Cin; skipped for the stem conv — the input
    needs no gradient), and dw (a [27*Cin, M] @ [M, Cout] contraction over
    batch*spatial — lanes key on Cout).
    """
    comps = []  # (flops, lane)
    lane = lambda c: min(c, 128) / 128.0
    for _, v, cin, cout, k3, fl in ops:
        comps.append((2 * fl, lane(cout)))          # fwd + remat recompute
        if cin > 1:
            comps.append((fl, lane(cin)))           # dx
        comps.append((fl, lane(cout)))              # dw
    total = sum(f for f, _ in comps)
    inv = sum(f / total / l for f, l in comps)
    ceiling = 1.0 / inv
    print(f"\ntrain step (fwd + remat + dx + dw): {total / 1e12:.3f} TFLOP "
          f"per window per sample")
    print(f"FLOP-weighted TRAIN lane ceiling: {ceiling * 100:.1f}% of peak "
          f"= {ceiling * PEAK_V5E / 1e12:.1f} TFLOP/s on v5e")
    return total, ceiling


def measure(total_flops: float, ceiling: float, window_batch: int = 2):
    import jax
    import jax.numpy as jnp
    from lifelong_nnunet_tpu.inference.sliding_window import (
        compute_steps, predict_sliding_window_multi)
    from lifelong_nnunet_tpu.models.unet import GenericUNet, maybe_pallas_conv

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    model = maybe_pallas_conv(GenericUNet(
        num_classes=CLASSES, pool_op_kernel_sizes=((2, 2, 2),) * POOLS,
        conv_kernel_sizes=((3, 3, 3),) * (POOLS + 1), base_num_features=BASE,
        max_num_features=FMAX, dtype=jnp.bfloat16))
    params = jax.device_put(model.init(
        jax.random.PRNGKey(0), jnp.zeros((1,) + PATCH + (1,)))["params"])
    apply_fn = lambda p, x: model.apply({"params": p}, x)

    steps = compute_steps(VOLUME, PATCH, 0.5)
    n_windows = math.prod(len(s) for s in steps)
    vol_flops = total_flops * n_windows * 8  # 8-way mirror TTA
    print(f"\nwindow grid {tuple(len(s) for s in steps)} = {n_windows} windows"
          f"; volume TTA FLOPs = {vol_flops / 1e12:.1f} TFLOP")

    # stage 1: bare TTA forward — the mirror variants of `window_batch`
    # windows exactly as the inference path runs them (scan over 8 mirror
    # combos of batch-wb forwards at this scale)
    x = jnp.asarray(np.random.RandomState(0).normal(
        size=(window_batch,) + PATCH + (1,)), jnp.bfloat16)

    @jax.jit
    def tta_fwd(p, x):
        def body(acc, flips):
            xf = jax.lax.cond(
                flips[0] > 0, lambda v: jnp.flip(v, 1), lambda v: v, x)
            xf = jax.lax.cond(
                flips[1] > 0, lambda v: jnp.flip(v, 2), lambda v: v, xf)
            xf = jax.lax.cond(
                flips[2] > 0, lambda v: jnp.flip(v, 3), lambda v: v, xf)
            out = apply_fn(p, xf)[0]
            return acc + out.astype(jnp.float32), 0
        combos = jnp.array([[a, b, c] for a in (0, 1) for b in (0, 1)
                            for c in (0, 1)], jnp.int32)
        acc, _ = jax.lax.scan(body, jnp.zeros(
            (window_batch,) + PATCH + (CLASSES,), jnp.float32), combos)
        return acc

    float(tta_fwd(params, x).sum())  # warmup/compile
    # DISTINCT inputs per rep: the axon relay dedupes identical
    # (program, args) dispatches — timed repeats of one input read 0 ms for
    # a 15-TFLOP program (r3 watcher log).  Scalar fetch per rep is the sync
    # (block_until_ready can return early on the relay).
    reps = 3
    xs = [jnp.asarray(np.random.RandomState(100 + r).normal(
        size=(window_batch,) + PATCH + (1,)), jnp.bfloat16)
        for r in range(reps)]
    t0 = time.perf_counter()
    outs = [tta_fwd(params, xv) for xv in xs]
    for o in outs:
        float(o.sum())
    dt = (time.perf_counter() - t0) / reps
    fwd_flops = total_flops * window_batch * 8
    tfs = fwd_flops / dt / 1e12
    print(f"bare TTA8 forward (wb={window_batch}): {dt * 1e3:.0f} ms "
          f"= {tfs:.1f} TFLOP/s = {tfs / (PEAK_V5E / 1e12) * 100:.1f}% of peak "
          f"= {tfs / (ceiling * PEAK_V5E / 1e12) * 100:.0f}% of lane ceiling")
    per_vol_fwd = dt / (window_batch * 8) * n_windows * 8

    # stage 2: full-volume streamed e2e at TTA8 AND TTA1.  The slab
    # dispatch/accumulate/finalize/host-transfer cost is identical for both
    # (same grids, same buffers); only the forward scales by 8 — so
    #   fwd8 = (e2e8 - e2e1) * 8/7,   overhead = e2e8 - fwd8
    # splits the pipeline without internal hooks.  Distinct volumes per call
    # (relay dedup, see above).
    def stream(tag, mirror_axes, seed0):
        vols = [np.random.RandomState(seed0 + i).normal(
            size=VOLUME + (1,)).astype(np.float32) for i in range(3)]
        predict_sliding_window_multi(apply_fn, params, vols[:1], PATCH,
                                     CLASSES, mirror_axes=mirror_axes,
                                     window_batch=window_batch, output="seg")
        t0 = time.perf_counter()
        predict_sliding_window_multi(apply_fn, params, vols[1:], PATCH,
                                     CLASSES, mirror_axes=mirror_axes,
                                     window_batch=window_batch, output="seg")
        dt = (time.perf_counter() - t0) / 2
        print(f"streamed e2e {tag}: {dt:.1f} s/vol = {1 / dt:.3f} vol/s")
        return dt
    e2e8 = stream("TTA8", (0, 1, 2), 200)
    e2e1 = stream("TTA1", (), 300)
    fwd8 = max(0.0, (e2e8 - e2e1) * 8.0 / 7.0)
    ovh = e2e8 - fwd8
    tfs_e2e = vol_flops / e2e8 / 1e12
    tfs_fwd = vol_flops / fwd8 / 1e12 if fwd8 else float("inf")
    print(f"bare-forward extrapolation/volume: {per_vol_fwd:.1f} s")
    print(f"TTA-scaling split: forward {fwd8:.1f} s/vol "
          f"({tfs_fwd:.1f} TFLOP/s = "
          f"{tfs_fwd / (ceiling * PEAK_V5E / 1e12) * 100:.0f}% of lane "
          f"ceiling), non-forward overhead {ovh:.1f} s/vol")
    print(f"e2e {tfs_e2e:.1f} TFLOP/s = "
          f"{tfs_e2e / (ceiling * PEAK_V5E / 1e12) * 100:.0f}% of lane ceiling")
    print(f"structural floor: {vol_flops / (ceiling * PEAK_V5E) :.1f} s/vol "
          f"-> {ceiling * PEAK_V5E / vol_flops:.3f} vol/s ceiling")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--measure", action="store_true")
    ap.add_argument("--window_batch", type=int, default=2)
    ap.add_argument("--train", action="store_true",
                    help="also print the analytic TRAIN-step lane ceiling")
    args = ap.parse_args()
    total, ceiling = lane_ceiling_table(conv_census())
    if args.train:
        train_ceiling_table(conv_census())
    if args.measure:
        measure(total, ceiling, args.window_batch)
