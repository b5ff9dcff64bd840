"""Chained probe part 4: native-H W-merged strided conv (the round-5 fix
candidate), decoder wide-conv gate extension rows, leftover upT b2."""
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

# ---- A. native-H strided conv end-to-end vs direct ------------------------
for sp, cin, cout, b, n in ((128, 32, 64, 4, 8), (64, 64, 128, 4, 12),
                            (32, 128, 256, 4, 16)):
    w = jnp.asarray(np.random.RandomState(3).normal(
        scale=1 / np.sqrt(27 * cin), size=(3, 3, 3, cin, cout)),
        jnp.bfloat16)
    flops = 2 * b * (sp // 2) ** 3 * cin * cout * 27
    shape = (b, sp, sp, sp, cin)
    tag = f"s2 {sp}^3 C{cin}->{cout} b{b}"
    chained(f"s2-nativeH {tag}", lambda x, w=w: SUM(
        conv3d_slicewise(x, w, (2, 2, 2))), shape, flops, n)
    chained(f"s2-direct {tag}", lambda x, w=w: SUM(
        lax.conv_general_dilated(
            x, w, (2, 2, 2), [(1, 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))), shape, flops, n)

# ---- B. decoder wide convs: conv25d vs XLA (gate-extension rows) ----------
for sp, cin, cout, b, n in (((128, 128, 128), 96, 32, 4, 8),
                            ((64, 64, 64), 192, 64, 4, 12),
                            ((64, 64, 64), 128, 64, 4, 12)):
    w = jnp.asarray(np.random.RandomState(3).normal(
        scale=1 / np.sqrt(27 * cin), size=(3, 3, 3, cin, cout)),
        jnp.bfloat16)
    flops = 2 * b * int(np.prod(sp)) * cin * cout * 27
    shape = (b,) + sp + (cin,)
    tag = f"dec {sp[0]}^3 C{cin}->{cout} b{b}"
    chained(f"c25d {tag}", lambda x, w=w: SUM(
        conv3d_slicewise(x, w, (1, 1, 1))), shape, flops, n)
    chained(f"xla  {tag}", lambda x, w=w: SUM(
        lax.conv_general_dilated(
            x, w, (1, 1, 1), [(1, 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))), shape, flops, n)

# ---- C. hippo s0 gate-extension confirmation (C1->32 first conv) ----------
for cin, cout, b, n in ((1, 32, 9, 10), (32, 32, 9, 10)):
    sp = (40, 56, 40)
    w = jnp.asarray(np.random.RandomState(3).normal(
        scale=1 / np.sqrt(27 * max(cin, 1)), size=(3, 3, 3, cin, cout)),
        jnp.bfloat16)
    flops = 2 * b * int(np.prod(sp)) * cin * cout * 27
    shape = (b,) + sp + (cin,)
    tag = f"hippoC {sp[0]}x{sp[1]}x{sp[2]} C{cin}->{cout} b{b}"
    chained(f"c25d {tag}", lambda x, w=w: SUM(
        conv3d_slicewise(x, w, (1, 1, 1))), shape, flops, n)
    chained(f"xla  {tag}", lambda x, w=w: SUM(
        lax.conv_general_dilated(
            x, w, (1, 1, 1), [(1, 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))), shape, flops, n)

print("done", flush=True)
