"""Chained chip probe v2 — scan-over-stacked-inputs harness.

Round-5 finding (results/r5/upt_probe.log): ONE-SHOT timings on the axon
relay bottom out at a ~25-35 ms per-dispatch floor — every op measured
"0.5-1.4 T/s" regardless of its FLOPs, so the r4/r5 per-op upsample and
strided-conv numbers were measuring the RELAY, not the op.  (The r4 chained
scans dodge the floor but their carry-folding harness — strided slice +
channel tile — is itself a relayout-wall op, polluting small-op rows.)

This harness has neither problem: stack n distinct inputs, ``lax.scan``
consumes slice i per iteration and reduces the op output to a scalar
accumulator (no carry reshaping, no fold-down).  One dispatch per timed
rep; per-iteration cost = (t_n*n - floor)/n with n large enough that the
floor is <10%.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


from tools.probe_harness import chained  # noqa: E402


print(f"backend={jax.default_backend()}", flush=True)
print("| case | ms/iter | T/s |")
print("|---|---|---|")

from lifelong_nnunet_tpu.ops.conv25d import (conv3d_slicewise,  # noqa: E402
                                             conv_transpose3d_matmul,
                                             conv_transpose3d_slicewise)
from lifelong_nnunet_tpu.ops.pallas.interleave import (  # noqa: E402
    conv_transpose3d_matmul_pallas)

SUM = lambda y: jnp.sum(y.astype(jnp.float32))  # noqa: E731

# ---- 1. upsample variants (CT decoder main level) ------------------------
for sp, cin, cout, b, n in ((64, 64, 32, 4, 10), (32, 128, 64, 4, 16)):
    w = jnp.asarray(np.random.RandomState(3).normal(
        scale=1 / np.sqrt(cin), size=(2, 2, 2, cin, cout)), jnp.bfloat16)
    flops = 2 * b * sp ** 3 * cin * cout * 8
    shape = (b, sp, sp, sp, cin)
    tag = f"{sp}^3 C{cin}->{cout} b{b}"
    chained(f"upT-pallas {tag}", lambda x, w=w: SUM(
        conv_transpose3d_matmul_pallas(x, w)), shape, flops, n)
    chained(f"upT-matmulstack {tag}", lambda x, w=w: SUM(
        conv_transpose3d_matmul(x, w, (2, 2, 2))), shape, flops, n)
    chained(f"upT-slicewise {tag}", lambda x, w=w: SUM(
        conv_transpose3d_slicewise(x, w, (2, 2, 2))), shape, flops, n)
    chained(f"upT-direct {tag}", lambda x, w=w: SUM(
        lax.conv_transpose(x, w, (2, 2, 2), "VALID",
                           dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))),
        shape, flops, n)
    chained(f"upT-barematmul {tag}", lambda x, w=w, cin=cin, cout=cout:
            sum(SUM(x.reshape(-1, cin) @ w[i, j].transpose(1, 0, 2)
                    .reshape(cin, 2 * cout))
                for i in range(2) for j in range(2)), shape, flops, n)

# ---- 2. strided conv: phase-merged vs direct -----------------------------
for sp, cin, cout, b, n in ((128, 32, 64, 4, 8), (64, 64, 128, 4, 12)):
    w = jnp.asarray(np.random.RandomState(3).normal(
        scale=1 / np.sqrt(27 * cin), size=(3, 3, 3, cin, cout)),
        jnp.bfloat16)
    flops = 2 * b * (sp // 2) ** 3 * cin * cout * 27
    shape = (b, sp, sp, sp, cin)
    tag = f"s2 {sp}^3 C{cin}->{cout} b{b}"
    chained(f"s2-phase {tag}", lambda x, w=w: SUM(
        conv3d_slicewise(x, w, (2, 2, 2))), shape, flops, n)
    chained(f"s2-direct {tag}", lambda x, w=w: SUM(
        lax.conv_general_dilated(
            x, w, (2, 2, 2), [(1, 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))), shape, flops, n)

# ---- 3. hippocampus-scale conv25d vs XLA (ViT/train-MFU lever) -----------
for b, n in ((4, 24), (9, 16)):
    for cin, cout, sp in ((32, 32, (40, 56, 40)), (64, 64, (20, 28, 20))):
        w = jnp.asarray(np.random.RandomState(3).normal(
            scale=1 / np.sqrt(27 * cin), size=(3, 3, 3, cin, cout)),
            jnp.bfloat16)
        flops = 2 * b * int(np.prod(sp)) * cin * cout * 27
        shape = (b,) + sp + (cin,)
        tag = f"hippo {sp[0]}x{sp[1]}x{sp[2]} C{cin}->{cout} b{b}"
        chained(f"c25d {tag}", lambda x, w=w: SUM(
            conv3d_slicewise(x, w, (1, 1, 1))), shape, flops, n)
        chained(f"xla  {tag}", lambda x, w=w: SUM(
            lax.conv_general_dilated(
                x, w, (1, 1, 1), [(1, 1)] * 3,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))),
            shape, flops, n)

# ---- 4. deep-stage rows (the r4 holes) -----------------------------------
from lifelong_nnunet_tpu.models.unet import ConvNormAct  # noqa: E402

for sp, c, b, n in ((32, 128, 4, 16), (16, 256, 4, 24), (8, 320, 4, 24)):
    flops = 2 * 2 * b * sp ** 3 * c * c * 27
    shape = (b, sp, sp, sp, c)
    kw = dict(features=c, kernel=(3, 3, 3), stride=(1, 1, 1),
              dtype=jnp.bfloat16)
    m0 = ConvNormAct(**kw, name="b0")
    m1 = ConvNormAct(**kw, name="b1")
    x0 = jnp.asarray(np.random.RandomState(1).normal(size=shape),
                     jnp.bfloat16)
    p0 = m0.init(jax.random.PRNGKey(0), x0)
    p1 = m1.init(jax.random.PRNGKey(1), x0)
    chained(f"stage-xla {sp}^3 C{c} b{b}", lambda x, m0=m0, m1=m1, p0=p0,
            p1=p1: SUM(m1.apply(p1, m0.apply(p0, x))), shape, flops, n)

# ---- 5. dispatch-floor calibration ---------------------------------------
chained("floor tinymatmul", lambda x: SUM(x @ x), (128, 128), 2 * 128 ** 3,
        n=1, reps=5)
print("done", flush=True)
