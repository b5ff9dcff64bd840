"""DMA block pack/unpack: move big-volume convs into XLA's fast regime.

Measured chain of evidence (RESULTS.md round 4, results/r4/stage_scan_*):
  * XLA's 3x3x3 conv at C=32 runs at ~10-12 TFLOP/s on [b2-4, 128^3] and on
    W-whole anisotropic blocks, but at **51-57 TFLOP/s** on [b128+, 34^3]
    VALID blocks — the fast regime needs small CUBIC windows at large batch.
  * Every XLA-level pack into that layout (reshape+concat halo packing,
    gather-split) loses the whole gain: XLA materializes the minor-dim data
    movement at ~18 GB/s.
  * The Pallas fused im2col kernel (ops/pallas/conv3d) is capped near
    15 TFLOP/s by VMEM col-assembly traffic (32 FLOP/byte of assembly).

Conclusion implemented here: do the blocking with DMA — an overlapping-
window copy is addressing, not arithmetic.  ``pack_blocks`` copies halo'd
[bs+2]^3 windows out of the padded volume into a [n_blocks, bs+2, bs+2, We,
C] array at HBM bandwidth (~0.5 GB moved per CT stage-0 conv, ~1 ms);
``unpack_blocks`` scatters VALID conv outputs back.  The conv itself stays
an XLA op on the blocked layout, where it reaches the 51+ TFLOP/s regime.

DMA window alignment (Mosaic tiled HBM memrefs, established empirically in
ops/pallas/conv3d and tools/repro_pack.py): the MINOR dim needs 128-lane
multiples (starts and extents) and the SECOND-MINOR dim 8-aligned
starts/extents; higher dims are unconstrained.  A channels-last C=32 minor
violates the 128 rule (the first formulation crashed Mosaic's remote
compile — results/r4/stage_scan_packed.log), so the kernels run on a
FUSED-MINOR view [B, D, H, W*C] (a free reshape: W and C are contiguous):
  * minor (W*C) windows have extent We*C (1280 for bs=32/C=32 — 10x128)
    and starts k*bs*C (128-aligned for C % 16 == 0, see plan());
  * H is second-minor: fetch extent rounds to He = round8(bs+2), starts
    j*bs are 8-aligned for bs % 8 == 0;
  * the volume is pre-padded +1 low on every axis (so window starts are
    block-aligned) and high so the rounded He/We fetch extents exist; the
    junk rows/columns are trimmed by the conv's NEGATIVE high padding on
    H and W (lax.conv padding (bs+2)-He / (bs+2)-We: zero extra FLOPs);
  * D windows are exact (bs+2) — no alignment constraint, no junk.
The kernels use a flat 1-D grid and keep BOTH operands in ANY (direct
HBM->HBM copies, no pipelined blocks) — the most constraint-free Mosaic
form (tools/repro_pack.py isolates the alternatives).

Reference counterpart: none — this is TPU layout engineering for the
upstream nnU-Net conv stages (generic_UNet StackedConvLayers at CT scale).
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round8(v: int) -> int:
    return -(-v // 8) * 8


def plan(spatial, bs: int, channels=None) -> bool:
    """True when [D, H, W] can be packed at block size ``bs``.

    ``channels``: optional iterable of channel counts that will ride the
    DMA kernels at this block size (the conv's Cin for pack, Cout for
    unpack).  On TPU the fused-minor windows need 128-lane-aligned starts
    and extents: bs*C % 128 == 0 (window starts k*bs*C, unpack extents
    bs*C) and We*C % 128 == 0 (pack extents).  Pass None to skip (CPU
    interpret-mode tests)."""
    if not (bs % 8 == 0 and all(s % bs == 0 for s in spatial)
            and all(s >= bs for s in spatial)):
        return False
    if channels is not None:
        We = _round8(bs + 2)
        for c in channels:
            if (bs * c) % 128 or (We * c) % 128:
                return False
    return True


# In-flight DMA window: the serial start()/wait()-per-block form measured
# only 17-27 GB/s (results/r4/repro_pack.log — strided-descriptor latency,
# not bandwidth), so the kernels keep Q copies outstanding across grid
# steps: step m waits for the copy issued at m-Q (same semaphore slot)
# before issuing its own, and the last step drains the tail.
_LOOKAHEAD = 8


def _pack_kernel(xf_hbm, out_hbm, sems, *, bs, He, We, C, nd, nh, nw,
                 nb, Q):
    """Flat grid (nb,): Q-deep pipelined halo'd fused-minor window DMAs."""
    m = pl.program_id(0)

    def dma_for(idx):
        b = idx // (nd * nh * nw)
        r = idx % (nd * nh * nw)
        i = r // (nh * nw)
        r = r % (nh * nw)
        j = r // nw
        k = r % nw
        return pltpu.make_async_copy(
            xf_hbm.at[b, pl.ds(i * bs, bs + 2), pl.ds(j * bs, He),
                      pl.ds(k * bs * C, We * C)],
            out_hbm.at[idx], sems.at[idx % Q])

    @pl.when(m >= Q)
    def _():
        dma_for(m - Q).wait()

    dma_for(m).start()

    @pl.when(m == nb - 1)
    def _():
        for idx in range(max(0, nb - Q), nb):
            dma_for(idx).wait()


@functools.partial(jax.jit, static_argnames=("bs",))
def pack_blocks(x, bs: int = 32):
    """[B, D, H, W, C] -> halo'd blocks [B*nd*nh*nw, bs+2, He, We, C].

    He = We = round8(bs+2); H rows / W columns beyond bs+2 are junk (feed
    the conv with ``conv_pads(bs)`` to ignore them).  Block order is
    row-major (b, d, h, w) — ``unpack_blocks`` inverts it."""
    B, D, H, W, C = x.shape
    assert plan((D, H, W), bs), (x.shape, bs)
    nd, nh, nw = D // bs, H // bs, W // bs
    He = We = _round8(bs + 2)
    # +1 low pad on each axis aligns window starts to block boundaries;
    # H/W high pads cover the rounded fetch extents of the last blocks
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, He - bs - 1), (1, We - bs - 1),
                     (0, 0)))
    xf = xp.reshape(B, xp.shape[1], xp.shape[2], xp.shape[3] * C)  # free
    nb = B * nd * nh * nw
    Q = min(nb, _LOOKAHEAD)

    kern = functools.partial(_pack_kernel, bs=bs, He=He, We=We, C=C,
                             nd=nd, nh=nh, nw=nw, nb=nb, Q=Q)
    out = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((nb, bs + 2, He, We * C), x.dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA((Q,))],
    )(xf)
    return out.reshape(nb, bs + 2, He, We, C)  # free


def conv_pads(bs: int):
    """Conv padding config consuming ``pack_blocks`` output exactly: VALID
    on D, negative high padding trims the junk H rows / W columns (no
    FLOPs)."""
    He = We = _round8(bs + 2)
    return ((0, 0), (0, (bs + 2) - He), (0, (bs + 2) - We))


def _unpack_kernel(yf_hbm, out_hbm, sems, *, bs, C, nd, nh, nw, nb, Q):
    """Flat grid (nb,): Q-deep pipelined VALID-block-to-window DMAs."""
    m = pl.program_id(0)

    def dma_for(idx):
        b = idx // (nd * nh * nw)
        r = idx % (nd * nh * nw)
        i = r // (nh * nw)
        r = r % (nh * nw)
        j = r // nw
        k = r % nw
        return pltpu.make_async_copy(
            yf_hbm.at[idx],
            out_hbm.at[b, pl.ds(i * bs, bs), pl.ds(j * bs, bs),
                       pl.ds(k * bs * C, bs * C)],
            sems.at[idx % Q])

    @pl.when(m >= Q)
    def _():
        dma_for(m - Q).wait()

    dma_for(m).start()

    @pl.when(m == nb - 1)
    def _():
        for idx in range(max(0, nb - Q), nb):
            dma_for(idx).wait()


@functools.partial(jax.jit, static_argnames=("B", "grid"))
def unpack_blocks(y, B: int, grid):
    """Blocked VALID outputs [B*nd*nh*nw, bs, bs, bs, C] -> [B, D, H, W, C]
    (inverse of pack_blocks block order)."""
    nd, nh, nw = grid
    nb, bs, _, _, C = y.shape
    assert nb == B * nd * nh * nw, (y.shape, B, grid)
    yf = y.reshape(nb, bs, bs, bs * C)  # free
    Q = min(nb, _LOOKAHEAD)

    kern = functools.partial(_unpack_kernel, bs=bs, C=C, nd=nd, nh=nh,
                             nw=nw, nb=nb, Q=Q)
    out = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct(
            (B, nd * bs, nh * bs, nw * bs * C), y.dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA((Q,))],
    )(yf)
    return out.reshape(B, nd * bs, nh * bs, nw * bs, C)  # free


def pick_bs(spatial, prefer=(32, 16, 8), batch: int = 1,
            min_blocks: int = 1, channels=None):
    """Largest supported block size dividing every axis whose total block
    count (batch * grid) reaches ``min_blocks`` (the fast conv regime needs
    enough independent windows — results/r4/stage_scan_blocked.log), or
    None.  ``channels`` forwards to plan() (TPU DMA lane alignment)."""
    for bs in prefer:
        if plan(spatial, bs, channels) and \
                batch * int(np.prod([s // bs for s in spatial])) >= min_blocks:
            return bs
    return None


def packed_stage(x, w1, scale1, offset1, w2, scale2, offset2,
                 negative_slope: float = 0.01, epsilon: float = 1e-5,
                 bs: int = 32, out_dtype=None, stride1=(1, 1, 1)):
    """Two fused (conv3x3 -> InstanceNorm -> LeakyReLU) layers with each
    conv running VALID over DMA-packed [bs+2]^3 blocks (the fast-regime
    layout).  Numerically identical to the direct pair: the VALID outputs
    partition the volume, so the InstanceNorm stats are exact, and the halo
    supplies each block's true neighbor/zero border (symmetric k//2
    padding semantics, incl. the stride-2 downsampling grid — see
    ops/blocked_conv.stride_ok).

    x: [B, D, H, W, Cin]; w1: [3,3,3,Cin,Cm]; w2: [3,3,3,Cm,Cout].
    stride1 in {1,2}^3 (the encoder downsampling conv).  Composition of two
    ``packed_conv_in_lrelu`` calls (each differentiable), so this is too."""
    dt = out_dtype or x.dtype
    z1 = packed_conv_in_lrelu(x, w1, scale1, offset1, negative_slope,
                              epsilon, dt, bs, stride1)
    bs2 = pick_bs(z1.shape[1:4],
                  channels=None if jax.devices()[0].platform != "tpu"
                  else (z1.shape[-1], w2.shape[-1]))
    return packed_conv_in_lrelu(z1, w2, scale2, offset2, negative_slope,
                                epsilon, dt, bs2, (1, 1, 1))


def _conv_blocked(v, w, strides, bs):
    """pack -> VALID conv (neg-W-pad) -> unpack: the fast-regime SAME conv.
    v channels-last [B, D, H, W, Cin]; returns [B, D', H', W', Cout]."""
    from jax import lax
    grid = tuple(s // bs for s in v.shape[1:4])
    xb = pack_blocks(v, bs)
    yb = lax.conv_general_dilated(
        xb, w.astype(v.dtype), tuple(strides), conv_pads(bs),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    return unpack_blocks(yb, v.shape[0], grid)


def _in_stats(y):
    """Exact per-(B, C) mean / rsqrt-var of the conv output (f32)."""
    yf = y.astype(jnp.float32)
    n = float(np.prod(y.shape[1:4]))
    mean = jnp.sum(yf, axis=(1, 2, 3)) / n
    var = jnp.maximum(jnp.sum(jnp.square(yf), axis=(1, 2, 3)) / n
                      - jnp.square(mean), 0.0)
    return mean, var


def _fused_fwd_impl(x, w, scale, offset, negative_slope, epsilon, out_dtype,
                    bs, strides):
    y = _conv_blocked(x, w, strides, bs)
    mean, var = _in_stats(y)
    inv = jax.lax.rsqrt(var + epsilon)
    dt = out_dtype
    mul = (inv * scale[None, :]).astype(dt)[:, None, None, None, :]
    sub = ((mean * inv * scale[None, :]) - offset[None, :]).astype(dt)[
        :, None, None, None, :]
    z = y.astype(dt) * mul - sub
    out = jnp.where(z >= 0, z, negative_slope * z)
    return out, (y, mean, inv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _fused(x, w, scale, offset, negative_slope, epsilon, out_dtype, bs,
           strides):
    return _fused_fwd_impl(x, w, scale, offset, negative_slope, epsilon,
                           out_dtype, bs, strides)[0]


def _fused_fwd(x, w, scale, offset, negative_slope, epsilon, out_dtype, bs,
               strides):
    out, (y, mean, inv) = _fused_fwd_impl(
        x, w, scale, offset, negative_slope, epsilon, out_dtype, bs, strides)
    # NOT saving `out`: the LeakyReLU mask is recomputed from (y, mean, inv,
    # scale, offset) — a few elementwise ops instead of a second full
    # feature map alive per block (same policy as ops/pallas/conv3d)
    return out, (x, w, scale, offset, y, mean, inv)


def _fused_bwd(negative_slope, epsilon, out_dtype, bs, strides, res, g):
    """Analytic backward (mirrors ops/pallas/conv3d._fused_bwd, channels-
    last): LeakyReLU mask -> InstanceNorm backward -> dx via the SAME
    packed fast-regime conv with the flipped kernel (stride 1; the strided
    downsampling dx falls back to XLA's dilated conv-grad), dw via XLA's
    conv weight-grad lowering (its contraction runs over the huge spatial
    dim — efficient at any C)."""
    from jax import lax
    x, w, scale, offset, y, mean, inv = res
    gf = g.astype(jnp.float32)
    yhat = (y.astype(jnp.float32) - mean[:, None, None, None, :]) \
        * inv[:, None, None, None, :]
    # recomputed pre-activation; sign differs from the emitted value only
    # within rounding distance of 0 where both branches coincide
    z = yhat * scale[None, None, None, None, :] \
        + offset[None, None, None, None, :]
    dz = jnp.where(z >= 0, gf, negative_slope * gf)
    dscale = jnp.sum(dz * yhat, axis=(0, 1, 2, 3))
    doffset = jnp.sum(dz, axis=(0, 1, 2, 3))
    m_dz = jnp.mean(dz, axis=(1, 2, 3), keepdims=True)
    m_dzy = jnp.mean(dz * yhat, axis=(1, 2, 3), keepdims=True)
    gi = (scale[None, :] * inv)[:, None, None, None, :]
    dy = (gi * (dz - m_dz - yhat * m_dzy)).astype(x.dtype)

    if tuple(strides) == (1, 1, 1):
        w_flip = jnp.flip(w, axis=(0, 1, 2)).swapaxes(-1, -2).astype(x.dtype)
        dx = _conv_blocked(dy, w_flip, (1, 1, 1), bs)
    else:
        # strided downsampling: dx is the input-dilated transposed conv —
        # take it from XLA's own conv-grad lowering (one term per strided
        # stage; the stride-1 stages above carry the FLOPs)
        _, pb = jax.vjp(
            lambda xx: lax.conv_general_dilated(
                xx, w.astype(x.dtype), tuple(strides), [(1, 1)] * 3,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC")),
            x)
        (dx,) = pb(dy)
    xf = x.astype(jnp.float32)
    _, pullback = jax.vjp(
        lambda ww: lax.conv_general_dilated(
            xf, ww, tuple(strides), [(1, 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC")),
        w.astype(jnp.float32))
    (dw,) = pullback(dy.astype(jnp.float32))
    return dx, dw.astype(w.dtype), dscale, doffset


_fused.defvjp(_fused_fwd, _fused_bwd)


def packed_conv_in_lrelu(x, w, scale, offset, negative_slope: float = 0.01,
                         epsilon: float = 1e-5, out_dtype=None,
                         bs: int = 32, strides=(1, 1, 1)):
    """Fused ConvNormAct on the DMA-packed fast-regime layout.

    Drop-in for the XLA composition in ``models/unet.ConvNormAct`` (conv
    bias absorbed exactly by the IN mean subtraction — none taken), and for
    ``ops/pallas/conv3d.conv3d_in_lrelu`` at big-volume shapes.  x is
    channels-last [B, D, H, W, Cin].  Differentiable: the custom VJP runs
    dx through the same packed conv (flipped kernel) and dw through XLA's
    weight-grad lowering.  Requires ``plan(x spatial, bs)``; strides in
    {1,2}^3 with uniform value (symmetric k//2 grid — blocked_conv.stride_ok
    semantics)."""
    return _fused(x, w, scale, offset, negative_slope, epsilon,
                  out_dtype or x.dtype, bs, tuple(strides))
