"""Attribute the CT non-forward overhead (round-3 split: 4.3 s/vol).

`tools/ct_roofline.py --measure` established e2e(TTA8)=29.1 s/vol with the
forward at 24.8 s/vol — leaving 4.3 s/vol that does NOT scale with TTA.
Once the packed conv lands, that residue bounds the headline, so split it:

  host_prep   np.pad + astype(bf16) of the 384x384x192 volume (1-CPU host)
  upload      device_put of the padded bf16 volume + block_until_ready
  device_tta1 full single-volume TTA1 predict (forward ~3.1 s inside)
  fwd_tta1    bare TTA1 forward over the same 50 windows (scan, wb)
  e2e_tta1    predict_sliding_window (includes prep+upload+download+undo)

residual device overhead = device_tta1 - fwd_tta1  (OA adds, softmax,
gaussian weighting, argmax, slab machinery); host/IO = e2e - device_tta1.

Distinct inputs per timed rep (relay-dedup discipline, RESULTS.md round 3).

Usage: python tools/ct_overhead_profile.py [--reps 3]   (idle chip)
"""
from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VOL = (384, 384, 192)
PATCH = (128, 128, 128)
CLASSES = 3
WB = int(os.environ.get("LNN_CT_WB", "4"))


def median(xs):
    return float(np.median(np.asarray(xs)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from bench import CT, _make_model  # same model/config as the bench line
    from lifelong_nnunet_tpu.inference import sliding_window as sw

    print(f"backend={jax.default_backend()} wb={WB}", flush=True)
    model = _make_model(CLASSES, CT["pools"], jnp.bfloat16, inference=True)
    params = jax.device_put(model.init(
        jax.random.PRNGKey(0), jnp.zeros((1,) + PATCH + (1,)))["params"])
    apply_fn = lambda p, x: model.apply({"params": p}, x)

    rng = np.random.RandomState(0)
    vols = [rng.normal(size=VOL + (1,)).astype(np.float32)
            for _ in range(args.reps + 1)]

    # ---- host prep + upload --------------------------------------------
    prep = sw._prepare_meta(VOL, PATCH, 0.5, WB, True)
    pads, undo, origins, wb, gaussian, grid_shape = prep
    t_prep, t_up = [], []
    for v in vols:
        t0 = time.perf_counter()
        pv = np.pad(v, pads) if any(any(p) for p in pads) else v
        pv = pv.astype(jnp.bfloat16)
        t1 = time.perf_counter()
        dev = jax.device_put(pv)
        dev.block_until_ready()
        t_prep.append(t1 - t0)
        t_up.append(time.perf_counter() - t1)
    print(f"host_prep  {median(t_prep):7.3f} s/vol  (pad+astype bf16)",
          flush=True)
    print(f"upload     {median(t_up):7.3f} s/vol  "
          f"({pv.nbytes / 1e6:.0f} MB bf16)", flush=True)

    # ---- device e2e single-volume, TTA1 vs TTA8 ------------------------
    for tta, axes in (("tta1", ()), ("tta8", (0, 1, 2))):
        ts = []
        # warmup on vols[0], time on the rest (distinct inputs)
        for r, v in enumerate(vols):
            t0 = time.perf_counter()
            out = sw.predict_sliding_window(
                apply_fn, params, v, PATCH, CLASSES, mirror_axes=axes,
                window_batch=WB, output="seg", input_bf16=True)
            dt = time.perf_counter() - t0
            assert out.shape == VOL and out.dtype == np.uint8
            if r > 0:
                ts.append(dt)
        print(f"e2e_{tta}   {median(ts):7.3f} s/vol", flush=True)

    # ---- bare TTA1 forward over the same windows (no OA/argmax/export) --
    padded = np.pad(vols[0], pads).astype(jnp.bfloat16) \
        if any(any(p) for p in pads) else vols[0].astype(jnp.bfloat16)
    if grid_shape is not None:  # regular grid: origins are implicit
        steps = [np.arange(g) * (p // 2) for g, p in zip(grid_shape, PATCH)]
        og = np.stack(np.meshgrid(*steps, indexing="ij"), -1).reshape(-1, 3)
    else:
        og = np.asarray(origins[0])
    npad = (-len(og)) % wb
    og = np.concatenate([og, np.repeat(og[:1], npad, 0)]) if npad else og
    print(f"grid={grid_shape} windows={len(og)} wb={wb}", flush=True)

    origins_b = jnp.asarray(og).reshape(-1, wb, 3)

    @jax.jit
    def fwd_only(p, data):
        def gather(o):
            return jax.lax.dynamic_slice(
                data, (o[0], o[1], o[2], 0), PATCH + (data.shape[-1],))

        def body(acc, ob):
            x = jax.vmap(gather)(ob)
            probs = sw._tta_forward_cm(apply_fn, p, x, ())
            return acc + jnp.sum(probs), None

        acc, _ = jax.lax.scan(body, jnp.float32(0), origins_b)
        return acc

    ts = []
    for r in range(args.reps + 1):
        dv = jax.device_put(np.asarray(padded, np.float32) + r).astype(
            jnp.bfloat16)
        dv.block_until_ready()
        t0 = time.perf_counter()
        fwd_only(params, dv).block_until_ready()
        if r > 0:
            ts.append(time.perf_counter() - t0)
    print(f"fwd_tta1   {median(ts):7.3f} s/vol  (bare window forwards)",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
