"""A/B: CT conv throughput vs BATCH — XLA vs the fused Pallas kernel.

Motivation (round-3 roofline follow-up): the CT e2e time is forward-bound,
and the forward runs at effective batch = window_batch (TTA mirror variants
are a lax.scan at this scale, so they do NOT add batch).  The round-2
lane-packing probe showed XLA's conv reaches ~85% of the C=32 lane ceiling
once the batch is large (41.6 TFLOP/s at b=64, hippocampus shapes) while at
b=2 it runs at ~4% of peak.  If that batch scaling holds at 128^3 CT shapes,
raising window_batch (and routing big-batch shapes to XLA) is worth more
than any kernel micro-optimization.  This tool measures exactly that curve.

  python tools/ab_ct_batch.py              # per-stage + full-forward curves
  python tools/ab_ct_batch.py --stages     # per-stage only (faster)
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def sync(x):
    """Reliable sync on the axon relay: scalar fetch (block_until_ready can
    return before remote execution completes)."""
    import jax.numpy as jnp
    return float(jnp.sum(x[0] if isinstance(x, (tuple, list)) else x))


def bench(fn, args_list, reps=3):
    """Median seconds/call over reps.  args_list MUST hold reps+1 DISTINCT
    input sets: the relay dedupes repeat (program, args) dispatches
    (observed 0 ms for 15-TFLOP programs), so warmup uses args_list[0] and
    each timed rep uses a fresh, never-before-dispatched set."""
    assert len(args_list) >= reps + 1, "need reps+1 distinct input sets"
    sync(fn(*args_list[0]))  # compile/warmup (input never timed)
    ts = []
    for r in range(reps):
        t0 = time.perf_counter()
        sync(fn(*args_list[1 + r]))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def stage_ab(b, sp, cin, cout, key):
    import jax
    import jax.numpy as jnp
    from lifelong_nnunet_tpu.models.unet import ConvNormAct

    shape = (b,) + sp + (cin,)
    flops = 2 * b * int(np.prod(sp)) * cin * cout * 27
    rows = []
    for pallas in (False, True):
        m = ConvNormAct(features=cout, kernel=(3, 3, 3), stride=(1, 1, 1),
                        dtype=jnp.bfloat16, pallas_conv=pallas)
        try:
            xs = [jnp.asarray(np.random.RandomState(7 * r + 1).normal(
                size=shape), jnp.bfloat16) for r in range(4)]
            params = m.init(key, xs[0])
            f = jax.jit(lambda p, x: m.apply(p, x))
            dt = bench(f, [(params, x) for x in xs])
            rows.append((pallas, dt, flops / dt / 1e12))
        except Exception as e:  # OOM etc — record, keep going
            rows.append((pallas, None, f"{type(e).__name__}"))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stages", action="store_true")
    ap.add_argument("--batches", type=int, nargs="*", default=[1, 2, 4, 8, 16])
    args = ap.parse_args()
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"backend={jax.default_backend()}")
    key = jax.random.PRNGKey(0)

    stages = [
        ("s0 128^3 C32", (128, 128, 128), 32, 32),
        ("s1 64^3 C64", (64, 64, 64), 64, 64),
        ("s2 32^3 C128", (32, 32, 32), 128, 128),
    ]
    print("| stage | b | XLA ms (T/s) | Pallas ms (T/s) |")
    print("|---|---|---|---|")
    for name, sp, cin, cout in stages:
        for b in args.batches:
            cells = []
            for pallas, dt, tfs in stage_ab(b, sp, cin, cout, key):
                if dt is None:
                    cells.append(f"FAIL:{tfs}")
                else:
                    cells.append(f"{dt * 1e3:.1f} ({tfs:.1f})")
            print(f"| {name} | {b} | {cells[0]} | {cells[1]} |", flush=True)

    if args.stages:
        return

    from lifelong_nnunet_tpu.models.unet import GenericUNet
    print("\nfull 5-pool CT forward (128^3):")
    print("| b | XLA ms (T/s) | Pallas ms (T/s) |")
    print("|---|---|---|")
    # analytic per-window fwd FLOPs from tools/ct_roofline.py census
    from ct_roofline import conv_census
    fl1 = sum(op[-1] for op in conv_census())
    for b in args.batches:
        cells = []
        for pallas in (False, True):
            model = GenericUNet(
                num_classes=3, pool_op_kernel_sizes=((2, 2, 2),) * 5,
                conv_kernel_sizes=((3, 3, 3),) * 6, base_num_features=32,
                max_num_features=320, dtype=jnp.bfloat16,
                pallas_conv=pallas)
            try:
                xs = [jnp.asarray(np.random.RandomState(11 * r + 1).normal(
                    size=(b, 128, 128, 128, 1)), jnp.bfloat16)
                    for r in range(4)]
                params = model.init(key, xs[0][:1])
                f = jax.jit(lambda p, x: model.apply(p, x)[0])
                dt = bench(f, [(params, x) for x in xs])
                cells.append(f"{dt * 1e3:.1f} ({fl1 * b / dt / 1e12:.1f})")
            except Exception as e:
                cells.append(f"FAIL:{type(e).__name__}")
        print(f"| {b} | {cells[0]} | {cells[1]} |", flush=True)


if __name__ == "__main__":
    main()
