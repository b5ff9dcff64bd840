"""Full-UNet forward A/B at the CT window shape: conv25d on vs off.

The e2e sweep showed only +1.6% (results/r4/wb_conv25d.log) while the
chained stage scan showed 1.6-1.9x on eligible stages — this isolates
whether the full-graph forward actually gets the stage win (if yes, the
e2e bottleneck is outside the forward; if no, the route is not firing or
XLA layout boundaries eat it).

Usage: python tools/ab_forward_conv25d.py [wb]
"""
import os
import sys
import time

import numpy as np

wb = int(sys.argv[1]) if len(sys.argv) > 1 else 4
os.environ["LNN_PALLAS_CONV"] = "1"

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/root/.jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from lifelong_nnunet_tpu.models.unet import GenericUNet

PATCH = (128, 128, 128)
CLASSES = 3


def build(conv25d: bool):
    m = GenericUNet(
        num_classes=CLASSES, pool_op_kernel_sizes=((2, 2, 2),) * 5,
        conv_kernel_sizes=((3, 3, 3),) * 6, base_num_features=32,
        max_num_features=320, dtype=jnp.bfloat16, pallas_conv=True,
        conv25d=conv25d)
    return m


def _sync(x):
    return float(np.asarray(x))


def run(conv25d: bool):
    m = build(conv25d)
    params = m.init(jax.random.PRNGKey(0),
                    jnp.zeros((1,) + PATCH + (1,), jnp.bfloat16))["params"]
    params = jax.device_put(params)

    @jax.jit
    def fwd(p, x):
        outs = m.apply({"params": p}, x)
        return jnp.sum(outs[0].astype(jnp.float32))

    rng = np.random.RandomState(5)
    xs = [jnp.asarray(rng.normal(size=(wb,) + PATCH + (1,)), jnp.bfloat16)
          for _ in range(4)]
    t0 = time.perf_counter()
    _sync(fwd(params, xs[0]))
    print(f"  compile+warm {time.perf_counter()-t0:.1f}s", flush=True)
    ts = []
    for r in range(3):
        t0 = time.perf_counter()
        _sync(fwd(params, xs[1 + r]))
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts))
    print(f"conv25d={int(conv25d)} wb={wb}: {dt*1e3:.1f} ms/forward "
          f"(reps {[f'{t*1e3:.0f}' for t in ts]})", flush=True)
    return dt


print(f"backend={jax.default_backend()} wb={wb}", flush=True)
d0 = run(False)
d1 = run(True)
print(f"speedup: {d0/d1:.2f}x", flush=True)
