"""Probe 6: Pallas phase-split strided conv vs direct XLA (the s0->s1
decision), plus the concat-free pair stage A/B."""
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

from lifelong_nnunet_tpu.ops.conv25d import (  # noqa: E402
    conv3d_phase_strided, conv25d_in_lrelu_pair, conv25d_in_lrelu)

for sp, cin, cout, b, n in ((128, 32, 64, 4, 8), (64, 64, 128, 4, 12),
                            (32, 128, 256, 4, 16)):
    w = jnp.asarray(np.random.RandomState(3).normal(
        scale=1 / np.sqrt(27 * cin), size=(3, 3, 3, cin, cout)),
        jnp.bfloat16)
    flops = 2 * b * (sp // 2) ** 3 * cin * cout * 27
    shape = (b, sp, sp, sp, cin)
    tag = f"s2 {sp}^3 C{cin}->{cout} b{b}"
    chained(f"s2-phasekrnl {tag}", lambda x, w=w: SUM(
        conv3d_phase_strided(x, w)), shape, flops, n)
    chained(f"s2-direct {tag}", lambda x, w=w: SUM(
        lax.conv_general_dilated(
            x, w, (2, 2, 2), [(1, 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))), shape, flops, n)

# concat-free pair vs concat-then-conv25d (dec0 first conv + IN + LReLU)
C1, C2, CO, SP, B, n = 32, 32, 32, 128, 4, 8
w = jnp.asarray(np.random.RandomState(3).normal(
    scale=0.05, size=(3, 3, 3, C1 + C2, CO)), jnp.bfloat16)
sc = jnp.ones((CO,), jnp.float32)
of = jnp.zeros((CO,), jnp.float32)
flops = 2 * B * SP ** 3 * (C1 + C2) * CO * 27
shape = (B, SP, SP, SP, C1 + C2)  # pre-stacked input; split in-op


def pair_op(x):
    return SUM(conv25d_in_lrelu_pair(x[..., :C1], x[..., C1:], w, sc, of))


def cat_op(x):
    # the old path: one conv25d on the concatenated input (input already
    # materialized here — isolates the conv; e2e also pays the concat)
    return SUM(conv25d_in_lrelu(x, w, sc, of))


chained(f"dec0-pair {SP}^3 C{C1}+{C2}->{CO} b{B}", pair_op, shape, flops, n)
chained(f"dec0-cat  {SP}^3 C{C1}+{C2}->{CO} b{B}", cat_op, shape, flops, n)
print("done", flush=True)
