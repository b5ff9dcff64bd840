"""Pallas flash-attention probe for the ViT path (VERDICT r2 #9).

The Generic_ViT_UNet's attention shapes are SHORT-sequence: the patch rule
(largest common divisor <= 16 of the feature-map dims, reference
generic_ViT_UNet.py:148) yields ~175 tokens for hippocampus (5x7x5 of the
40x56x40 first skip at patch 8) and ~512 for CT-scale (8^3 at patch 16).
This probe measures XLA's attention (the models/vit.py einsum composition)
vs jax's bundled Pallas flash-attention kernel at exactly these shapes, plus
a long-sequence control where flash attention should win, so the decision to
wire it (or not) is evidence-based.

Usage (healthy chip, idle host):  python tools/ab_vit_attention.py
"""
from __future__ import annotations

import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

HEADS, HEAD_DIM = 12, 64  # ViT-base: embed 768


def xla_attention(q, k, v):
    """The models/vit.py Attention core (scaled dot-product, softmax in f32)."""
    logits = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                        preferred_element_type=jnp.float32)
    logits = logits * (1.0 / np.sqrt(q.shape[-1]))
    weights = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhnm,bhmd->bhnd", weights.astype(q.dtype), v)


def time_fn(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, flash_attention)

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"backend={jax.default_backend()} kind={jax.devices()[0].device_kind}")

    cases = [
        ("hippo V1 (pad 175->256)", 1, 256),
        ("hippo V1 b8", 8, 256),
        ("CT V1 (512 tokens)", 1, 512),
        ("CT V1 b8", 8, 512),
        ("long control 4096", 1, 4096),
        ("long control 8192", 1, 8192),
    ]
    rng = np.random.RandomState(0)
    for name, b, n in cases:
        q, k, v = (jnp.asarray(rng.normal(size=(b, HEADS, n, HEAD_DIM)),
                               jnp.bfloat16) for _ in range(3))
        block = min(512, n)
        bs = BlockSizes(block_q=block, block_k_major=block, block_k=block,
                        block_b=1, block_q_major_dkv=block,
                        block_k_major_dkv=block, block_k_dkv=block,
                        block_q_dkv=block, block_k_major_dq=block,
                        block_k_dq=block, block_q_dq=block)
        f_xla = jax.jit(xla_attention)
        f_fl = jax.jit(partial(flash_attention, causal=False,
                               sm_scale=1.0 / np.sqrt(HEAD_DIM),
                               block_sizes=bs))
        try:
            o1 = f_xla(q, k, v)
            o2 = f_fl(q, k, v)
            err = float(jnp.max(jnp.abs(o1.astype(jnp.float32)
                                        - o2.astype(jnp.float32))))
            t_xla = time_fn(f_xla, q, k, v)
            t_fl = time_fn(f_fl, q, k, v)
            print(f"{name:26s} XLA {t_xla * 1e3:7.3f} ms | flash "
                  f"{t_fl * 1e3:7.3f} ms | flash/XLA {t_xla / t_fl:5.2f}x "
                  f"| max_err {err:.3e}")
        except Exception as e:  # noqa: BLE001
            print(f"{name:26s} FAILED: {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
