"""Isolate decoder upsampling + strided-downsample cost at CT scale.

The conv25dx scan crashed RESOURCE_EXHAUSTED before these rows; fresh
process, one case per jit, del+sync between cases.

Usage: python tools/ab_upsample.py
"""
import os
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


def one_shot(tag, fn, x_shape, flops, reps=3):
    f = jax.jit(fn)
    rng = np.random.RandomState(11)
    xs = [jnp.asarray(rng.normal(size=x_shape), jnp.bfloat16)
          for _ in range(reps + 1)]
    try:
        _sync(f(xs[0]))
        ts = []
        for r in range(reps):
            t0 = time.perf_counter()
            _sync(f(xs[1 + r]))
            ts.append(time.perf_counter() - t0)
        dt = float(np.median(ts))
        print(f"| {tag} | {dt*1e3:.2f} ({flops/dt/1e12:.1f} T/s) |",
              flush=True)
    except Exception as e:
        print(f"| {tag} | FAIL:{type(e).__name__}: {str(e)[:90]} |",
              flush=True)
    finally:
        del xs, f


print(f"backend={jax.default_backend()}", flush=True)
print("| case | ms (T/s) |")
print("|---|---|")

# ConvTranspose k=s=2: direct vs matmul+depth-to-space, decoder scales, b4
for sp, cin, cout, b in (((64, 64, 64), 64, 32, 4),
                         ((32, 32, 32), 128, 64, 4),
                         ((16, 16, 16), 256, 128, 4)):
    w = jnp.asarray(np.random.RandomState(3).normal(
        scale=1 / np.sqrt(cin), size=(2, 2, 2, cin, cout)), jnp.bfloat16)
    flops = 2 * b * int(np.prod(sp)) * cin * cout * 8
    shape = (b,) + sp + (cin,)

    def f_direct(x, w=w):
        y = lax.conv_transpose(x, w, (2, 2, 2), "VALID",
                               dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        return jnp.sum(y.astype(jnp.float32))

    w2 = w.reshape(8, cin, cout).transpose(1, 0, 2).reshape(cin, 8 * cout)
    D, H, W = sp

    def f_matmul(x, w2=w2, D=D, H=H, W=W, cout=cout, b=b):
        y = x @ w2
        y = y.reshape(b, D, H, W, 2, 2, 2, cout)
        y = y.transpose(0, 1, 4, 2, 5, 3, 6, 7)
        y = y.reshape(b, 2 * D, 2 * H, 2 * W, cout)
        return jnp.sum(y.astype(jnp.float32))

    one_shot(f"upT-direct b{b} {sp[0]}^3 C{cin}->{cout}", f_direct,
             shape, flops)
    one_shot(f"upT-matmul b{b} {sp[0]}^3 C{cin}->{cout}", f_matmul,
             shape, flops)

# strided downsample isolation (one-shot, no chain): conv25d vs direct
from lifelong_nnunet_tpu.ops.conv25d import conv3d_slicewise  # noqa: E402

for sp, cin, cout, b in (((128, 128, 128), 32, 64, 4),
                         ((64, 64, 64), 64, 128, 4)):
    w = jnp.asarray(np.random.RandomState(3).normal(
        scale=1 / np.sqrt(27 * cin), size=(3, 3, 3, cin, cout)),
        jnp.bfloat16)
    flops = 2 * b * int(np.prod(sp)) // 8 * cin * cout * 27
    shape = (b,) + sp + (cin,)
    one_shot(f"s2-25d b{b} {sp[0]}^3 C{cin}->{cout}",
             lambda x, w=w: jnp.sum(
                 conv3d_slicewise(x, w, (2, 2, 2)).astype(jnp.float32)),
             shape, flops)
    one_shot(f"s2-direct b{b} {sp[0]}^3 C{cin}->{cout}",
             lambda x, w=w: jnp.sum(lax.conv_general_dilated(
                 x, w, (2, 2, 2), [(1, 1)] * 3,
                 dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
                 .astype(jnp.float32)),
             shape, flops)

# seg-head 1x1 conv + softmax at full res (bandwidth check)
for sp, cin, ncls, b in (((128, 128, 128), 32, 3, 4),):
    w = jnp.asarray(np.random.RandomState(3).normal(
        scale=1 / np.sqrt(cin), size=(1, 1, 1, cin, ncls)), jnp.bfloat16)
    nbytes = b * int(np.prod(sp)) * cin * 2
    shape = (b,) + sp + (cin,)
    one_shot(f"seghead+softmax b{b} {sp[0]}^3 C{cin}->{ncls}",
             lambda x, w=w: jnp.sum(jax.nn.softmax(
                 lax.conv_general_dilated(
                     x, w, (1, 1, 1), "VALID",
                     dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
                 .astype(jnp.float32), axis=-1)),
             shape, 2 * b * int(np.prod(sp)) * cin * ncls)
