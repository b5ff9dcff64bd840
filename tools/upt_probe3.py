"""Chained probe part 3: hippocampus conv gate rows, deep-stage rows,
phase-strided component isolation, dispatch floor.  Same harness as
upt_probe2 (device-resident stack + scalar perturbation)."""
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

SUM = lambda y: jnp.sum(y.astype(jnp.float32))  # noqa: E731

from lifelong_nnunet_tpu.ops.conv25d import conv3d_slicewise  # noqa: E402

# ---- A. hippocampus-scale conv25d vs XLA (ViT/train-MFU lever) -----------
for b, n in ((4, 16), (9, 10)):
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

# ---- B. deep-stage rows ---------------------------------------------------
from lifelong_nnunet_tpu.models.unet import ConvNormAct  # noqa: E402

for sp, c, b, n in ((32, 128, 4, 12), (16, 256, 4, 16), (8, 320, 4, 16)):
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

# ---- C. s1->s2 strided + phase-path component isolation -------------------
for sp, cin, cout, b, n in ((64, 64, 128, 4, 12),):
    w = jnp.asarray(np.random.RandomState(3).normal(
        scale=1 / np.sqrt(27 * cin), size=(3, 3, 3, cin, cout)),
        jnp.bfloat16)
    flops = 2 * b * (sp // 2) ** 3 * cin * cout * 27
    shape = (b, sp, sp, sp, cin)
    chained(f"s2-direct s2 {sp}^3 C{cin}->{cout} b{b}", lambda x, w=w: SUM(
        lax.conv_general_dilated(
            x, w, (2, 2, 2), [(1, 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))), shape, flops, n)

# phase components at the pathological shape (128^3 C32->64 b4):
B, SP, CI, CO = 4, 128, 32, 64
shape = (B, SP, SP, SP, CI)
n = 8
# C1: the H-phase strided slice ALONE (is the 227 ms the slice?)
chained("phase-slice-only 128^3", lambda x: SUM(
    x.reshape(B * SP, SP, SP // 2, 2 * CI)[:, 0::2])
    + SUM(x.reshape(B * SP, SP, SP // 2, 2 * CI)[:, 1::2]),
    shape, 1e9, n)
# C2: stride-1 conv2d with the phase kernels on a PRE-SPLIT half input
w2 = jnp.asarray(np.random.RandomState(3).normal(
    scale=0.1, size=(2, 2, 2 * CI, 3 * CO)), jnp.bfloat16)
half = (B * SP, SP // 2, SP // 2, 2 * CI)
chained("phase-conv-only (2,2)k b512 64x64 C64->192", lambda x, w2=w2: SUM(
    lax.conv_general_dilated(x, w2, (1, 1), [(1, 0), (1, 0)],
                             dimension_numbers=("NHWC", "HWIO", "NHWC"))),
    half, 2 * B * SP * (SP // 2) ** 2 * 4 * 2 * CI * 3 * CO, n)

# ---- D. dispatch floor ----------------------------------------------------
chained("floor tinymatmul", lambda x: SUM(x @ x), (128, 128), 2 * 128 ** 3,
        n=1, reps=5)
print("done", flush=True)
