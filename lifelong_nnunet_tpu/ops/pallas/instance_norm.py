"""Fused InstanceNorm + LeakyReLU as a Pallas TPU kernel (forward + backward).

The U-Net applies InstanceNorm+LeakyReLU after every conv (2 per stage,
SURVEY.md §2.8: ConvDropoutNormNonlin).  XLA implements it as separate
reduction + elementwise HLOs (2-3 passes over the activation); this kernel
fuses statistics, normalization, affine, and the nonlinearity into one
VMEM-resident pass per (batch, channel-tile) grid cell, with a matching
fused backward.

Layout: x [B, N, C] (spatial flattened). Grid (B, C/CT); each cell owns the
full N for a channel tile, so the mean/var reduction never leaves VMEM.
Statistics are fp32 regardless of the activation dtype.

MEASURED VERDICT (v5e, [9, 11200, 64] bf16, scan-amortized): this kernel
runs at 0.149 ms/op vs XLA's fused reduce+elementwise at 0.084 ms/op — XLA
already emits a near-optimal schedule for this pattern, so the model keeps
the XLA path (`models/unet.InstanceNorm`) by default.  The kernel stays as a
correctness-tested foundation for future fusions that XLA cannot do (e.g.
folding the norm into a neighboring Pallas conv epilogue).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-5


VMEM_BUDGET = 10 * 1024 * 1024  # leave headroom of the ~16MB/core


def _pick_ct(C: int, N: int) -> int:
    """Largest channel tile whose (in + out + fp32 temp) block fits VMEM."""
    for ct in (128, 64, 32, 16, 8):
        if C % ct == 0 and N * ct * 8 <= VMEM_BUDGET:
            return ct
    return 0  # no feasible tile -> caller falls back to the XLA reference


def _fwd_kernel(x_ref, scale_ref, bias_ref, out_ref, mean_ref, rstd_ref,
                *, alpha: float):
    x = x_ref[0].astype(jnp.float32)                 # [N, CT]
    n = x.shape[0]
    mean = jnp.sum(x, axis=0, keepdims=True) / n     # [1, CT]
    xc = x - mean
    var = jnp.sum(xc * xc, axis=0, keepdims=True) / n
    rstd = jax.lax.rsqrt(var + EPS)
    y = xc * rstd * scale_ref[:] + bias_ref[:]
    out_ref[0] = jnp.where(y >= 0, y, alpha * y).astype(out_ref.dtype)
    mean_ref[0] = mean
    rstd_ref[0] = rstd


def _bwd_kernel(x_ref, scale_ref, bias_ref, mean_ref, rstd_ref, g_ref,
                dx_ref, dscale_ref, dbias_ref, *, alpha: float):
    x = x_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)
    mean, rstd = mean_ref[0], rstd_ref[0]
    scale = scale_ref[:]
    xhat = (x - mean) * rstd
    y = xhat * scale + bias_ref[:]
    dy = jnp.where(y >= 0, g, alpha * g)             # leaky-relu backward
    n = x.shape[0]
    dscale_ref[0] = jnp.sum(dy * xhat, axis=0, keepdims=True)
    dbias_ref[0] = jnp.sum(dy, axis=0, keepdims=True)
    dxhat = dy * scale
    # instance-norm backward: dx = rstd*(dxhat - mean(dxhat) - xhat*mean(dxhat*xhat))
    m1 = jnp.sum(dxhat, axis=0, keepdims=True) / n
    m2 = jnp.sum(dxhat * xhat, axis=0, keepdims=True) / n
    dx_ref[0] = (rstd * (dxhat - m1 - xhat * m2)).astype(dx_ref.dtype)


def _fwd_call(x, scale, bias, alpha):
    B, N, C = x.shape
    CT = _pick_ct(C, N)
    grid = (B, C // CT)
    out, mean, rstd = pl.pallas_call(
        partial(_fwd_kernel, alpha=alpha),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, N, CT), lambda b, c: (b, 0, c), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CT), lambda b, c: (0, c), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CT), lambda b, c: (0, c), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, N, CT), lambda b, c: (b, 0, c), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, CT), lambda b, c: (b, 0, c), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, CT), lambda b, c: (b, 0, c), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, N, C), x.dtype),
            jax.ShapeDtypeStruct((B, 1, C), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, C), jnp.float32),
        ],
    )(x, scale.reshape(1, C).astype(jnp.float32),
      bias.reshape(1, C).astype(jnp.float32))
    return out, mean, rstd


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def instance_norm_leaky(x, scale, bias, alpha: float = 0.01):
    """x: [B, N, C]; scale/bias: [C]. Returns LeakyReLU(IN(x)*scale+bias)."""
    out, _, _ = _fwd_call(x, scale, bias, alpha)
    return out


def _in_fwd(x, scale, bias, alpha):
    out, mean, rstd = _fwd_call(x, scale, bias, alpha)
    return out, (x, scale, bias, mean, rstd)


def _in_bwd(alpha, res, g):
    x, scale, bias, mean, rstd = res
    B, N, C = x.shape
    CT = _pick_ct(C, N)
    grid = (B, C // CT)
    dx, dscale_b, dbias_b = pl.pallas_call(
        partial(_bwd_kernel, alpha=alpha),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, N, CT), lambda b, c: (b, 0, c), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CT), lambda b, c: (0, c), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CT), lambda b, c: (0, c), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, CT), lambda b, c: (b, 0, c), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, CT), lambda b, c: (b, 0, c), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, CT), lambda b, c: (b, 0, c), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, N, CT), lambda b, c: (b, 0, c), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, CT), lambda b, c: (b, 0, c), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, CT), lambda b, c: (b, 0, c), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, N, C), x.dtype),
            jax.ShapeDtypeStruct((B, 1, C), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, C), jnp.float32),
        ],
    )(x, scale.reshape(1, C).astype(jnp.float32),
      bias.reshape(1, C).astype(jnp.float32), mean, rstd, g)
    dscale = dscale_b.sum(axis=(0, 1)).astype(scale.dtype)
    dbias = dbias_b.sum(axis=(0, 1)).astype(bias.dtype)
    return dx, dscale, dbias


instance_norm_leaky.defvjp(_in_fwd, _in_bwd)


def instance_norm_leaky_nd(x, scale, bias, alpha: float = 0.01):
    """Convenience wrapper for [B, *spatial, C] inputs; falls back to the XLA
    reference when no VMEM-feasible tiling exists."""
    B, C = x.shape[0], x.shape[-1]
    flat = x.reshape(B, -1, C)
    if _pick_ct(C, flat.shape[1]) == 0:
        return reference_instance_norm_leaky(x, scale, bias, alpha)
    return instance_norm_leaky(flat, scale, bias, alpha).reshape(x.shape)


def reference_instance_norm_leaky(x, scale, bias, alpha: float = 0.01):
    """Pure-jnp reference (same math) for testing."""
    axes = tuple(range(1, x.ndim - 1))
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=axes, keepdims=True)
    var = xf.var(axis=axes, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + EPS) * scale + bias
    return jnp.where(y >= 0, y, alpha * y).astype(x.dtype)
