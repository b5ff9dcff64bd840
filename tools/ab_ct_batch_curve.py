"""Bare CT forward throughput vs conv batch (the round-3 CT lever probe).

The CT e2e number is conv-bound: at window_batch=2 the TTA variants scan as
batch-2 forwards and the measured ~13 TFLOP/s is ~18% of the 35.8% lane
ceiling (tools/ct_roofline.py), while the hippocampus path — whose TTA
batch of 64 is fused into one forward — reaches 73% of its ceiling.  This
probe measures the bare 128^3 forward at batch 1/2/4/8 (per arm: XLA vs
Pallas fused conv) to find the throughput/batch curve and the HBM limit,
deciding whether raising window_batch (or fusing mirror pairs into the scan
step) is the CT win.

Sync discipline: scalar host fetch after the timed reps — on the axon relay
block_until_ready can return before remote execution completes (observed).

Usage (idle host): python tools/ab_ct_batch_curve.py [batches...] [--pallas]
"""
import os
import sys
import time

import numpy as np

batches = [int(a) for a in sys.argv[1:] if a.isdigit()] or [1, 2, 4, 8]
os.environ["LNN_PALLAS_CONV"] = "1" if "--pallas" in sys.argv else "0"

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from lifelong_nnunet_tpu.models.unet import GenericUNet, maybe_pallas_conv

PATCH = (128, 128, 128)
CLASSES = 3
FWD_TFLOP_PER_SAMPLE = 0.955  # tools/ct_roofline.py analytic census

jax.config.update("jax_compilation_cache_dir", "/root/.jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

model = maybe_pallas_conv(GenericUNet(
    num_classes=CLASSES, pool_op_kernel_sizes=((2, 2, 2),) * 5,
    conv_kernel_sizes=((3, 3, 3),) * 6, base_num_features=32,
    max_num_features=320, dtype=jnp.bfloat16))
params = jax.device_put(model.init(
    jax.random.PRNGKey(0), jnp.zeros((1,) + PATCH + (1,)))["params"])


@jax.jit
def fwd(p, x):
    return model.apply({"params": p}, x)[0].astype(jnp.float32).sum()


print(f"backend={jax.default_backend()} pallas={os.environ['LNN_PALLAS_CONV']}")
rng = np.random.RandomState(0)
for b in batches:
    try:
        # DISTINCT input per rep (+ a warmup-only input): the relay dedupes
        # repeat (program, args) dispatches — same fix as ct_roofline.py.
        reps = 3
        xs = [jnp.asarray(rng.normal(size=(b,) + PATCH + (1,)), jnp.bfloat16)
              for _ in range(reps + 1)]
        float(fwd(params, xs[0]))  # compile + warm
        t0 = time.perf_counter()
        outs = [fwd(params, xv) for xv in xs[1:]]
        for s in outs:
            float(s)
        dt = (time.perf_counter() - t0) / reps
        tfs = FWD_TFLOP_PER_SAMPLE * b / dt
        print(f"batch {b}: {dt * 1e3:7.1f} ms = {tfs:5.1f} TFLOP/s "
              f"({tfs / 1.97:4.1f}% of v5e peak)", flush=True)
    except Exception as e:  # OOM etc.
        print(f"batch {b}: FAILED {type(e).__name__}: {str(e)[:160]}",
              flush=True)
