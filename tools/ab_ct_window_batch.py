"""CT sliding-window sweep: window_batch x {XLA, Pallas conv}.

At CT scale the TTA variants run as a lax.scan of batch-wb forwards, so
window_batch IS the conv batch; XLA folds batch into MXU lanes (memory
note: axon-tpu measurement discipline), so larger wb may lift the
C=32-stage throughput if activations fit HBM.

Usage: python tools/ab_ct_window_batch.py wb1 [wb2 ...] [--pallas]
Run on an IDLE host.
"""
import os
import sys
import time

import numpy as np

wbs = [int(a) for a in sys.argv[1:] if a.isdigit()] or [2, 4]
# the fused conv is ON by default since the default flip — force the XLA
# baseline explicitly when --pallas is absent so both sweep arms are real
os.environ["LNN_PALLAS_CONV"] = "1" if "--pallas" in sys.argv else "0"

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from lifelong_nnunet_tpu.models.unet import GenericUNet, maybe_pallas_conv
from lifelong_nnunet_tpu.inference.sliding_window import predict_sliding_window_multi

PATCH = (128, 128, 128)
VOL = (384, 384, 192)
CLASSES = 3

model = maybe_pallas_conv(GenericUNet(
    num_classes=CLASSES, pool_op_kernel_sizes=((2, 2, 2),) * 5,
    conv_kernel_sizes=((3, 3, 3),) * 6, base_num_features=32,
    max_num_features=320, dtype=jnp.bfloat16))
params = jax.device_put(model.init(
    jax.random.PRNGKey(0), jnp.zeros((1,) + PATCH + (1,)))["params"])
apply_fn = lambda p, x: model.apply({"params": p}, x)

# DISTINCT volume per pass incl. a warmup-only volume: the relay dedupes
# repeat (program, args) dispatches, so re-timing the warmed volume's slabs
# would read ~0 ms (same fix as ct_roofline.py).
rng = np.random.RandomState(0)
vols = [rng.normal(size=VOL + (1,)).astype(np.float32) for _ in range(3)]

for wb in wbs:
    try:
        t0 = time.perf_counter()
        predict_sliding_window_multi(apply_fn, params, vols[:1], PATCH, CLASSES,
                                     mirror_axes=(0, 1, 2), window_batch=wb,
                                     output="seg")
        warm = time.perf_counter() - t0
        t0 = time.perf_counter()
        segs = predict_sliding_window_multi(apply_fn, params, vols[1:], PATCH,
                                            CLASSES, mirror_axes=(0, 1, 2),
                                            window_batch=wb, output="seg")
        dt = (time.perf_counter() - t0) / (len(vols) - 1)
        print(f"wb={wb} pallas={os.environ['LNN_PALLAS_CONV']}: "
              f"{dt:.1f} s/vol ({1/dt:.4f} vol/s), warm pass {warm:.0f}s, "
              f"checksum {int(segs[0].sum())}", flush=True)
    except Exception as e:  # OOM etc.
        print(f"wb={wb}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
