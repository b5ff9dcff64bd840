"""Shared chip-measurement harness for the r5+ probe tools.

Encodes the three relay gotchas that invalidated earlier measurements:
  1. ~25-35 ms per-dispatch floor -> one-shot op timings are meaningless;
     chain n iterations per dispatch (lax.scan over a stacked input).
  2. The relay dedups identical (program, args) pairs -> every timed rep
     must vary its inputs (a scalar factor on a device-resident stack —
     uploading fresh GB-scale stacks saturates the tunnel instead).
  3. ``jax.block_until_ready`` is NOT a real barrier through the relay ->
     timings must fetch a value (scalar reduction transfer).
"""
import time

import numpy as np


def chained(tag, op, shape, flops, n=12, reps=3, seed=11):
    """Median per-iteration latency of scan(op over n input slices)."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    try:
        def run(xs, s):
            def body(acc, x):
                return acc + op(x * s), None
            acc, _ = lax.scan(body, jnp.float32(0.0), xs)
            return acc
        f = jax.jit(run)
        rng = np.random.RandomState(seed)
        xs = jnp.asarray(rng.normal(size=(n,) + shape), jnp.bfloat16)
        float(np.asarray(f(xs, jnp.bfloat16(1.0))))
        ts = []
        for r in range(reps):
            s = jnp.bfloat16(1.0 + 0.125 * (r + 1))
            t0 = time.perf_counter()
            float(np.asarray(f(xs, s)))
            ts.append(time.perf_counter() - t0)
        dt = float(np.median(ts)) / n
        print(f"| {tag} | {dt*1e3:.2f} | {flops/dt/1e12:.1f} |", flush=True)
        return dt
    except Exception as e:
        print(f"| {tag} | FAIL {type(e).__name__}: {str(e)[:80]} | |",
              flush=True)
        return None
