"""Crash-isolated stage-cost scans: one subprocess per case.

Round-4 lesson (VERDICT r4 weak #5): the monolithic scan tools share one
process, so a single RESOURCE_EXHAUSTED poisons every later row and can
wedge the chip.  Here the parent never touches the TPU; each case runs in
its own ``python tools/isoscan.py --case NAME`` subprocess with a timeout,
and emits ONE json line the parent collects into a markdown table.

Usage:
  python tools/isoscan.py --suite upt          # upsample variants
  python tools/isoscan.py --suite strided      # phase-merged strided conv
  python tools/isoscan.py --suite stages      # deep-stage (C>=128) costs
  python tools/isoscan.py --suite conv2d      # bare conv2d regime rows
  python tools/isoscan.py --case upt:matmul:64:64:32:4   # one case, in-proc
"""
from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time

import numpy as np

REPO = "/root/repo"


# ---------------------------------------------------------------- case defs

def _sync(x):
    return float(np.asarray(x))


def _time_one(fn, inputs, reps=4):
    """Median one-shot latency over distinct inputs (no chaining)."""
    import jax
    f = jax.jit(fn)
    _sync(f(inputs[0]))          # compile + warm
    ts = []
    for x in inputs[1:1 + reps]:
        t0 = time.perf_counter()
        _sync(f(x))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def _inputs(shape, n=5, dtype=None, seed=11):
    import jax.numpy as jnp
    dtype = dtype or jnp.bfloat16
    rng = np.random.RandomState(seed)
    return [jnp.asarray(rng.normal(size=shape), dtype) for _ in range(n)]


def case_upt(variant: str, sp: int, cin: int, cout: int, b: int):
    """ConvTranspose k=s=2 decoder upsample, one-shot."""
    import jax.numpy as jnp
    from jax import lax
    from lifelong_nnunet_tpu.ops.conv25d import (conv_transpose3d_matmul,
                                                 conv_transpose3d_slicewise)
    w = jnp.asarray(np.random.RandomState(3).normal(
        scale=1 / np.sqrt(cin), size=(2, 2, 2, cin, cout)), jnp.bfloat16)
    flops = 2 * b * sp ** 3 * cin * cout * 8
    shape = (b, sp, sp, sp, cin)

    if variant == "direct":
        def fn(x):
            y = lax.conv_transpose(x, w, (2, 2, 2), "VALID",
                                   dimension_numbers=("NDHWC", "DHWIO",
                                                      "NDHWC"))
            return jnp.sum(y.astype(jnp.float32))
    elif variant == "matmul":
        def fn(x):
            return jnp.sum(conv_transpose3d_matmul(
                x, w, (2, 2, 2)).astype(jnp.float32))
    elif variant == "slicewise":
        def fn(x):
            return jnp.sum(conv_transpose3d_slicewise(
                x, w, (2, 2, 2)).astype(jnp.float32))
    else:
        raise ValueError(variant)
    dt = _time_one(fn, _inputs(shape))
    return dict(ms=dt * 1e3, tflops=flops / dt / 1e12)


def case_strided(variant: str, sp: int, cin: int, cout: int, b: int,
                 sd: int = 2, sh: int = 2, sw: int = 2):
    """3x3x3 stride-2 downsample conv, one-shot."""
    import jax.numpy as jnp
    from jax import lax
    from lifelong_nnunet_tpu.ops.conv25d import conv3d_slicewise
    w = jnp.asarray(np.random.RandomState(3).normal(
        scale=1 / np.sqrt(27 * cin), size=(3, 3, 3, cin, cout)),
        jnp.bfloat16)
    stride = (sd, sh, sw)
    out_vox = (sp // sd) * (sp // sh) * (sp // sw)
    flops = 2 * b * out_vox * cin * cout * 27
    shape = (b, sp, sp, sp, cin)

    if variant == "phase":
        def fn(x):
            return jnp.sum(conv3d_slicewise(x, w, stride)
                           .astype(jnp.float32))
    elif variant == "direct":
        def fn(x):
            return jnp.sum(lax.conv_general_dilated(
                x, w, stride, [(1, 1)] * 3,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
                .astype(jnp.float32))
    else:
        raise ValueError(variant)
    dt = _time_one(fn, _inputs(shape))
    return dict(ms=dt * 1e3, tflops=flops / dt / 1e12)


def case_stage(variant: str, sp: int, c: int, b: int):
    """Two-conv fused stage (conv+IN+LReLU x2) at stride 1 — the deep
    C>=128 rows the r4 scans never landed."""
    import jax.numpy as jnp
    from lifelong_nnunet_tpu.models.unet import ConvNormAct

    flops = 2 * 2 * b * sp ** 3 * c * c * 27
    shape = (b, sp, sp, sp, c)
    kw = dict(features=c, kernel=(3, 3, 3), stride=(1, 1, 1),
              dtype=jnp.bfloat16)
    if variant == "pallas":
        kw["pallas_conv"] = True
    elif variant == "conv25d":
        kw["conv25d"] = True
    elif variant != "xla":
        raise ValueError(variant)
    import jax
    m0 = ConvNormAct(**kw, name="b0")
    m1 = ConvNormAct(**kw, name="b1")
    xs = _inputs(shape)
    p0 = m0.init(jax.random.PRNGKey(0), xs[0])
    p1 = m1.init(jax.random.PRNGKey(1), xs[0])

    def fn(x):
        y = m1.apply(p1, m0.apply(p0, x))
        return jnp.sum(y.astype(jnp.float32))
    dt = _time_one(fn, xs)
    return dict(ms=dt * 1e3, tflops=flops / dt / 1e12)


def case_conv2d(b: int, h: int, w: int, cin: int, cout: int,
                sh: int = 1, sw: int = 1):
    """Bare large-batch conv2d (the regime ceiling), one-shot."""
    import jax.numpy as jnp
    from jax import lax
    wk = jnp.asarray(np.random.RandomState(3).normal(
        scale=1 / np.sqrt(9 * cin), size=(3, 3, cin, cout)), jnp.bfloat16)
    flops = 2 * b * (h // sh) * (w // sw) * cin * cout * 9
    shape = (b, h, w, cin)

    def fn(x):
        y = lax.conv_general_dilated(
            x, wk, (sh, sw), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.sum(y.astype(jnp.float32))
    dt = _time_one(fn, _inputs(shape))
    return dict(ms=dt * 1e3, tflops=flops / dt / 1e12)


# -------------------------------------------------------------- suite defs

SUITES = {
    "upt": [f"upt:{v}:{sp}:{ci}:{co}:{b}"
            for sp, ci, co in ((64, 64, 32), (32, 128, 64), (16, 256, 128))
            for b in (2, 4)
            for v in ("matmul", "slicewise", "direct")],
    "strided": [f"strided:{v}:{sp}:{ci}:{co}:{b}"
                for sp, ci, co in ((128, 32, 64), (64, 64, 128),
                                   (32, 128, 256))
                for b in (4,)
                for v in ("phase", "direct")]
               + ["strided:phase:128:32:64:4:1:2:2",
                  "strided:direct:128:32:64:4:1:2:2"],
    "stages": [f"stage:{v}:{sp}:{c}:{b}"
               for sp, c in ((32, 128), (16, 256), (8, 320))
               for b in (4,)
               for v in ("xla", "pallas")],
    "conv2d": [f"conv2d:{b}:{h}:{w}:{ci}:{co}"
               for b, h, w, ci, co in ((512, 128, 128, 32, 96),
                                        (512, 128, 128, 64, 96),
                                        (256, 64, 64, 128, 192),
                                        (256, 64, 64, 128, 384),
                                        (128, 32, 32, 256, 768))]
              + ["conv2d:512:128:128:32:192:2:2",   # strided conv2d ref
                 "conv2d:512:128:128:32:192:1:1"],
}


def run_case(spec: str):
    parts = spec.split(":")
    kind = parts[0]
    if kind == "upt":
        v, sp, ci, co, b = parts[1], *map(int, parts[2:6])
        return case_upt(v, sp, ci, co, b)
    if kind == "strided":
        v = parts[1]
        nums = list(map(int, parts[2:]))
        return case_strided(v, *nums)
    if kind == "stage":
        v, sp, c, b = parts[1], *map(int, parts[2:5])
        return case_stage(v, sp, c, b)
    if kind == "conv2d":
        return case_conv2d(*map(int, parts[1:]))
    raise ValueError(spec)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--case")
    ap.add_argument("--suite")
    ap.add_argument("--timeout", type=int, default=240)
    args = ap.parse_args()

    if args.case:
        # child mode: touch the TPU, print one json line
        sys.path.insert(0, REPO)
        import jax
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_tpu_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        res = run_case(args.case)
        print(json.dumps({"case": args.case, **res}), flush=True)
        return

    assert args.suite, "need --suite or --case"
    specs = []
    for s in args.suite.split(","):
        specs += SUITES[s]
    print(f"# isoscan suite={args.suite} ({len(specs)} cases, "
          f"subprocess-isolated)", flush=True)
    print("| case | ms | T/s |")
    print("|---|---|---|")
    for spec in specs:
        try:
            out = subprocess.run(
                [sys.executable, __file__, "--case", spec],
                capture_output=True, text=True, timeout=args.timeout)
            line = [ln for ln in out.stdout.splitlines()
                    if ln.startswith("{")]
            if line:
                d = json.loads(line[-1])
                print(f"| {spec} | {d['ms']:.2f} | {d['tflops']:.1f} |",
                      flush=True)
            else:
                err = (out.stderr or "").strip().splitlines()
                print(f"| {spec} | FAIL rc={out.returncode} | "
                      f"{err[-1][:90] if err else ''} |", flush=True)
        except subprocess.TimeoutExpired:
            print(f"| {spec} | TIMEOUT {args.timeout}s | |", flush=True)


if __name__ == "__main__":
    main()
