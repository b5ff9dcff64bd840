"""Hippocampus sliding-window roofline ablation (idle host, real chip).

Decomposes the headline volume latency:
  1. bare TTA-batch-64 forward ([64, patch, 1] -> DS logits)
  2. full volume program (gather + TTA forward + class-major assembly +
     overlap-add + argmax) via _sliding_window_oa_jit
  3. the streamed end-to-end rate (predict_sliding_window_multi, depth-2
     dispatch pipeline) at several pipeline depths
plus XLA's own FLOP count for (1) and (2) -> achieved TFLOP/s vs the v5e
197 TFLOP/s bf16 peak.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from lifelong_nnunet_tpu.models.unet import GenericUNet, maybe_pallas_conv
from lifelong_nnunet_tpu.inference import sliding_window as sw

PATCH = (40, 56, 40)
VOL = (60, 84, 60)
K = 3

model = maybe_pallas_conv(GenericUNet(
    num_classes=K, pool_op_kernel_sizes=((2, 2, 2),) * 3,
    conv_kernel_sizes=((3, 3, 3),) * 4, base_num_features=32,
    max_num_features=320, dtype=jnp.bfloat16))
params = jax.device_put(model.init(
    jax.random.PRNGKey(0), jnp.zeros((1,) + PATCH + (1,)))["params"])
apply_fn = lambda p, x: model.apply({"params": p}, x)


def timed(fn, fetch, n=30, reps=3):
    fn()  # warm/compile
    outs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n):
            r = fn()
        fetch(r)
        outs.append((time.perf_counter() - t0) / n * 1e3)
    return min(outs)


def flops_of(jitted, *args):
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0))
    except Exception:
        return 0.0


# ---- 1. bare TTA-batch forward --------------------------------------------
x64 = jnp.asarray(np.random.RandomState(0).normal(
    size=(64,) + PATCH + (1,)).astype(np.float32)).astype(jnp.bfloat16)
fwd = jax.jit(lambda p, x: apply_fn(p, x)[0])
t_fwd = timed(lambda: fwd(params, x64), lambda r: np.asarray(r[0, 0, 0, 0]))
f_fwd = flops_of(fwd, params, x64)
print(f"bare b64 forward: {t_fwd:.1f} ms, {f_fwd/1e12:.2f} TFLOP "
      f"-> {f_fwd/t_fwd/1e9:.1f} TFLOP/s ({f_fwd/t_fwd/1e9/197:.1%} of peak)",
      flush=True)

# ---- 2. full volume program ----------------------------------------------
prep = sw._prepare_meta(VOL, PATCH, 0.5, 8, True)
pads, _, _, wb, gaussian, grid_shape = prep
vol = np.random.RandomState(1).normal(size=VOL + (1,)).astype(np.float32)
dev = jnp.asarray(np.pad(vol, pads)).astype(jnp.bfloat16)
print(f"grid {grid_shape}, wb {wb}, padded {dev.shape}", flush=True)

prog = lambda: sw._sliding_window_oa_jit(
    params, dev, jnp.float32(1.0), jnp.asarray(gaussian), apply_fn, K, wb,
    PATCH, grid_shape, (0, 1, 2), "seg")
t_vol = timed(prog, lambda r: np.asarray(r[0, 0, 0]))
jit_prog = jax.jit(lambda p, d: sw._sliding_window_oa_jit(
    p, d, jnp.float32(1.0), jnp.asarray(gaussian), apply_fn, K, wb,
    PATCH, grid_shape, (0, 1, 2), "seg"))
f_vol = flops_of(jit_prog, params, dev)
print(f"volume program (TTA8 + OA + argmax): {t_vol:.1f} ms, "
      f"{f_vol/1e12:.2f} TFLOP -> {f_vol/t_vol/1e9:.1f} TFLOP/s", flush=True)
print(f"  assembly tax vs bare forward: {t_vol - t_fwd:.1f} ms", flush=True)

# ---- 2b. component split: forward-scan vs overlap-add+argmax --------------
wb_eff = wb
import jax as _jax

@_jax.jit
def fwd_scan_only(p, d):
    probs = sw._grid_probs(p, d, grid_shape, None, jnp.asarray(gaussian),
                           apply_fn, K, wb_eff, PATCH, (0, 1, 2), jnp.bfloat16)
    return probs.ravel()[0]

t_scan = timed(lambda: fwd_scan_only(params, dev), lambda r: float(r))
print(f"gather+TTA-forward scan only: {t_scan:.1f} ms "
      f"(assembly-within-forward tax vs bare b64: {t_scan - t_fwd:.1f} ms)",
      flush=True)

probs_const = jnp.zeros((K,) + grid_shape + PATCH, jnp.bfloat16)

@_jax.jit
def oa_argmax_only(pr):
    acc = sw._oa_accumulate(pr, PATCH, dev.shape[:-1])
    return jnp.argmax(acc, axis=0).astype(jnp.uint8)

t_oa = timed(lambda: oa_argmax_only(probs_const),
             lambda r: np.asarray(r[0, 0, 0]))
print(f"overlap-add + argmax only: {t_oa:.1f} ms", flush=True)

# ---- 3. streamed end-to-end ----------------------------------------------
vols = [np.random.RandomState(i).normal(size=VOL + (1,)).astype(np.float32)
        for i in range(30)]
from lifelong_nnunet_tpu.inference.sliding_window import predict_sliding_window_multi
for vb in (1, 2, 4, 8):
    for rep in range(3):
        t0 = time.perf_counter()
        segs = predict_sliding_window_multi(apply_fn, params, vols, PATCH, K,
                                            mirror_axes=(0, 1, 2),
                                            window_batch=8, output="seg",
                                            volume_batch=vb)
        dt = (time.perf_counter() - t0) / len(vols)
        print(f"stream vb={vb} pass {rep}: {dt*1e3:.1f} ms/vol "
              f"({1/dt:.1f} vol/s)", flush=True)
