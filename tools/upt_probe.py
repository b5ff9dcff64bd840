"""Single-process chip probe: decoder-upsample variants (incl. the Pallas
interleave kernel), phase-merged strided conv, and the missing C>=128
stage rows — ordered most-important-first with incremental prints, ONE
TPU client (today's chip wedges on client churn; see r5 notes).
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


def _sync(x):
    return float(np.asarray(x))


def timed(tag, fn, shape, flops, reps=4, seed=11):
    try:
        f = jax.jit(fn)
        rng = np.random.RandomState(seed)
        xs = [jnp.asarray(rng.normal(size=shape), jnp.bfloat16)
              for _ in range(reps + 1)]
        _sync(f(xs[0]))
        ts = []
        for r in range(reps):
            t0 = time.perf_counter()
            _sync(f(xs[1 + r]))
            ts.append(time.perf_counter() - t0)
        dt = float(np.median(ts))
        print(f"| {tag} | {dt*1e3:.2f} | {flops/dt/1e12:.1f} |", flush=True)
        return dt
    except Exception as e:
        print(f"| {tag} | FAIL {type(e).__name__}: {str(e)[:80]} | |",
              flush=True)
        return None


print(f"backend={jax.default_backend()}", flush=True)
print("| case | ms | T/s |")
print("|---|---|---|")

from lifelong_nnunet_tpu.ops.conv25d import (conv3d_slicewise,  # noqa: E402
                                             conv_transpose3d_matmul,
                                             conv_transpose3d_slicewise)
from lifelong_nnunet_tpu.ops.pallas.interleave import (  # noqa: E402
    conv_transpose3d_matmul_pallas)

# ---- 1. upsample variants, CT decoder main level -------------------------
for sp, cin, cout, b in ((64, 64, 32, 4), (64, 64, 32, 2),
                         (32, 128, 64, 4)):
    w = jnp.asarray(np.random.RandomState(3).normal(
        scale=1 / np.sqrt(cin), size=(2, 2, 2, cin, cout)), jnp.bfloat16)
    flops = 2 * b * sp ** 3 * cin * cout * 8
    shape = (b, sp, sp, sp, cin)
    tag = f"{sp}^3 C{cin}->{cout} b{b}"

    timed(f"upT-pallas {tag}", lambda x, w=w: jnp.sum(
        conv_transpose3d_matmul_pallas(x, w).astype(jnp.float32)),
        shape, flops)
    timed(f"upT-barematmul {tag}", lambda x, w=w, cin=cin, cout=cout: jnp.sum(
        sum((x.reshape(-1, cin) @ w[i, j].transpose(1, 0, 2).reshape(
            cin, 2 * cout)).astype(jnp.float32).sum()
            for i in range(2) for j in range(2))), shape, flops)
    timed(f"upT-matmulstack {tag}", lambda x, w=w: jnp.sum(
        conv_transpose3d_matmul(x, w, (2, 2, 2)).astype(jnp.float32)),
        shape, flops)
    timed(f"upT-slicewise {tag}", lambda x, w=w: jnp.sum(
        conv_transpose3d_slicewise(x, w, (2, 2, 2)).astype(jnp.float32)),
        shape, flops)
    timed(f"upT-direct {tag}", lambda x, w=w: jnp.sum(
        lax.conv_transpose(x, w, (2, 2, 2), "VALID",
                           dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        .astype(jnp.float32)), shape, flops)

# ---- 2. phase-merged strided conv vs direct ------------------------------
for sp, cin, cout, b in ((128, 32, 64, 4), (64, 64, 128, 4)):
    w = jnp.asarray(np.random.RandomState(3).normal(
        scale=1 / np.sqrt(27 * cin), size=(3, 3, 3, cin, cout)),
        jnp.bfloat16)
    flops = 2 * b * (sp // 2) ** 3 * cin * cout * 27
    shape = (b, sp, sp, sp, cin)
    tag = f"s2 {sp}^3 C{cin}->{cout} b{b}"
    timed(f"s2-phase {tag}", lambda x, w=w: jnp.sum(
        conv3d_slicewise(x, w, (2, 2, 2)).astype(jnp.float32)),
        shape, flops)
    timed(f"s2-direct {tag}", lambda x, w=w: jnp.sum(
        lax.conv_general_dilated(
            x, w, (2, 2, 2), [(1, 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        .astype(jnp.float32)), shape, flops)

# ---- 3. the missing deep-stage rows (C>=128, XLA vs conv25d-ineligible) --
from lifelong_nnunet_tpu.models.unet import ConvNormAct  # noqa: E402

for sp, c, b in ((32, 128, 4), (16, 256, 4), (8, 320, 4)):
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
    timed(f"stage-xla {sp}^3 C{c} b{b}", lambda x, m0=m0, m1=m1, p0=p0,
          p1=p1: jnp.sum(m1.apply(p1, m0.apply(p0, x))
                         .astype(jnp.float32)), shape, flops)

print("done", flush=True)

# ---- 4. hippocampus-scale conv25d vs XLA (ViT/train-MFU lever) -----------
# eligible() excludes <256k-voxel items untested; if the 2.5D route wins at
# (b, 40, 56, 40, C32) (N*D = 160-360 2D batch), lower the gate -> both the
# ViT train step and hippocampus train MFU inherit the win.
for b in (4, 9):
    for cin, cout in ((32, 32), (64, 64)):
        sp = (40 if cin == 32 else 20, 56 if cin == 32 else 28,
              40 if cin == 32 else 20)
        w = jnp.asarray(np.random.RandomState(3).normal(
            scale=1 / np.sqrt(27 * cin), size=(3, 3, 3, cin, cout)),
            jnp.bfloat16)
        flops = 2 * b * int(np.prod(sp)) * cin * cout * 27
        shape = (b,) + sp + (cin,)
        tag = f"hippo {sp[0]}x{sp[1]}x{sp[2]} C{cin}->{cout} b{b}"
        timed(f"c25d {tag}", lambda x, w=w: jnp.sum(
            conv3d_slicewise(x, w, (1, 1, 1)).astype(jnp.float32)),
            shape, flops)
        timed(f"xla  {tag}", lambda x, w=w: jnp.sum(
            lax.conv_general_dilated(
                x, w, (1, 1, 1), [(1, 1)] * 3,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
            .astype(jnp.float32)), shape, flops)

print("done2", flush=True)
