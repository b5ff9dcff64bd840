"""Fused 3D conv (3x3x3, stride 1, SAME) + InstanceNorm + LeakyReLU — Pallas.

Why this kernel exists (measured on TPU v5e, RESULTS.md round 2): nnU-Net's
high-resolution encoder/decoder stages have 32/64 channels, and XLA's conv at
C=32 runs at ~11 TFLOP/s (6% of peak): the MXU tile is 128 wide, so a
channels-last conv wastes 4x in the output-channel lanes AND streams im2col
traffic from HBM.  The 25% ceiling is physical for Cout=32, but a direct conv
that keeps the halo in VMEM is compute-bound at that ceiling (~49 TFLOP/s)
instead of HBM/assembly-bound.

Key layout choice: the kernel runs CHANNELS-FIRST internally.  The im2col
tile is assembled along the SUBLANE axis ([27*Cin, M] with pieces [Cin, M] at
sublane offset t*Cin), so every assembly store is full-lane-width — a
channels-last assembly needs lane-offset stores at C/128 width, which Mosaic
executes 4x slower (measured: the lane-offset variant ties XLA; this one
wins).  The dot is then [Cout, 27*Cin] @ [27*Cin, M].

The kernel also emits per-channel sum/sum-of-squares partials of the f32
accumulator, so InstanceNorm costs one cheap XLA elementwise epilogue (which
also converts back to channels-last — a free transpose, it's bandwidth-bound
either way).

Reference counterpart: upstream nnU-Net's ConvDropoutNormNonlin
(conv3d+InstanceNorm3d+LeakyReLU); this is its TPU speed-of-light form.

Supported: kernel 3x3x3, stride 1, Cin/Cout <= 64, spatial dims with a
usable (dT, hT) tiling.  ``supported()`` reports eligibility; callers fall
back to the XLA composition otherwise (see models/unet.ConvNormAct).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_VMEM_BUDGET = 10 * 1024 * 1024  # leave headroom under ~16MB/core


def _pad(c, m):
    return -(-c // m) * m


def _pick_tiles(D: int, H: int, W: int, cin: int, cout: int):
    """(dT, hT) with D%dT==0, H%hT==0 whose working set fits VMEM."""
    def vmem_bytes(dT, hT):
        M = dT * hT * W
        x_blk = cin * (dT + 2) * _pad(hT + 2, 8) * _pad(W + 2, 128) * 2
        col = _pad(27 * cin, 16) * _pad(M, 128) * 2
        acc = _pad(cout, 8) * _pad(M, 128) * 4
        out = _pad(cout, 16) * _pad(M, 128) * 2
        return x_blk + col + acc + out  # slab is single-buffered

    # hT must be a multiple of 8: the halo DMA's H start is j*hT and the
    # tiled HBM layout requires 8-aligned starts/extents on that dim
    for dT, hT in ((4, 8), (2, 8), (1, 8), (2, 16), (1, 16)):
        if D % dT == 0 and H % hT == 0 and vmem_bytes(dT, hT) < _VMEM_BUDGET:
            return dT, hT
    return None


def supported(shape, kernel, strides) -> bool:
    """shape: channels-LAST [B, D, H, W, C] as the model sees it."""
    if tuple(kernel) != (3, 3, 3) or tuple(strides) != (1, 1, 1):
        return False
    if len(shape) != 5:
        return False
    _, D, H, W, C = shape
    if C > 64 or W % 128:
        return False
    return _pick_tiles(D, H, W, C, C) is not None


def pack_plan(shape, min_util: float = 0.45):
    """Lane-packing plan for widths that are not 128-lane multiples.

    nnU-Net fullres patches are rarely lane-aligned (hippocampus W=40/56,
    CT stage-1 W=64), and a W<128 minor dim would waste most of the MXU's
    lanes.  Instead, k windows from the BATCH are laid side by side along the
    lane axis with a 2-lane zero guard between them: a 3x3x3 SAME conv has
    radius 1, so the guard makes windows mutually invisible AND supplies each
    window's zero border — the packed conv is exact on the valid lanes, and
    the guard/pad lanes compute garbage that unpacking slices away.  H is
    padded to the 8-row sublane tiling the same way (SAME semantics
    preserved; garbage rows stripped).  InstanceNorm stats are taken AFTER
    unpacking, so they are exact per window.

    shape: channels-last [B, D, H, W, C] (C = max(cin, cout) for the VMEM
    check).  Returns (k, period, L, Hp, Bp) — k windows per lane slab of L
    lanes with stride ``period``, H padded to Hp, batch padded to Bp — or
    None when no packing reaches ``min_util`` MXU-lane utilization."""
    B, D, H, W, C = shape
    if W % 128 == 0 or W < 8:
        return None
    period = W + 2
    Hp = _pad(H, 8)
    best = None
    for k in range(1, min(B, 64) + 1):
        L = _pad(k * period, 128)
        if _pick_tiles(D, Hp, L, C, C) is None:
            continue
        Bp = _pad(B, k)
        util = (k * W * B * H) / (L * Bp * Hp)
        if best is None or util > best[0] + 1e-9:
            best = (util, (k, period, L, Hp, Bp))
    if best is None or best[0] < min_util:
        return None
    return best[1]


def eligible(shape, kernel, strides) -> bool:
    """True when either the direct (lane-aligned) or the packed path can run
    this channels-last shape."""
    if supported(shape, kernel, strides):
        return True
    if tuple(kernel) != (3, 3, 3) or tuple(strides) != (1, 1, 1) \
            or len(shape) != 5 or shape[-1] > 64:
        return False
    return pack_plan(shape) is not None


def _pack_cl_to_cf(x, plan):
    """channels-last [B, D, H, W, C] -> packed channels-first
    [Bp/k, C, D, Hp, L] (zero guards between windows, zero row/lane pad)."""
    k, period, L, Hp, Bp = plan
    B, D, H, W, C = x.shape
    x = jnp.pad(x, ((0, Bp - B), (0, 0), (0, Hp - H), (0, period - W),
                    (0, 0)))
    x = x.reshape(Bp // k, k, D, Hp, period, C)
    x = jnp.moveaxis(x, 1, 3)                    # [B', D, Hp, k, period, C]
    x = x.reshape(Bp // k, D, Hp, k * period, C)
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, L - k * period), (0, 0)))
    return jnp.moveaxis(x, -1, 1)


def _unpack_cf(y, plan, out_spatial):
    """packed channels-first [B', C, D, Hp, L] -> [B, C, D, H, W] with all
    guard lanes / padded rows / padded batch windows stripped."""
    k, period, L, Hp, Bp = plan
    B, (D, H, W) = out_spatial
    C = y.shape[1]
    y = y[..., :k * period]
    y = y.reshape(Bp // k, C, D, Hp, k, period)
    y = jnp.moveaxis(y, 4, 1)                    # [B', k, C, D, Hp, period]
    y = y.reshape(Bp, C, D, Hp, period)
    return y[:B, :, :, :H, :W]


def _conv_kernel(x_hbm, w_ref, y_ref, p_ref, slab_ref, col_ref, sem, *,
                 dT, hT, W, cin, cout, nD, nH, out_dtype):
    """One (b, d-tile, h-tile) grid cell, channels-first.

    The halo window is DMA'd manually from HBM (Element-indexed blocks would
    need the last two block dims tile-aligned, which a +2 halo never is).

    x_hbm:    [B, cin, D+2, H', W'] in HBM/ANY (H'/W' over-padded, see caller)
    w_ref:    [cout, 27*cin] (VMEM)
    slab_ref: [cin, dT+2, hslab, W'] VMEM scratch (halo window)
    col_ref:  [27*cin, dT*hT, W] VMEM scratch (3D: a full [*, M] flatten is a
              relayout Mosaic executes ~2x slower — measured)
    y_ref:    [1, cout, dT, hT, W]
    p_ref:    [1, 1, 1, 2, cout] per-tile IN partials
    """
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    hslab = slab_ref.shape[2]
    # NOTE: a double-buffered variant (prefetch next window while dotting the
    # current one) would hide ~1.7us/tile of DMA, but every formulation hit a
    # Mosaic layout-inference assert (layout.h:320) on this jax version —
    # single-buffered is the reliable form; revisit on a newer toolchain.
    dma = pltpu.make_async_copy(
        x_hbm.at[b, :, pl.ds(i * dT, dT + 2), pl.ds(j * hT, hslab), :],
        slab_ref, sem)
    dma.start()
    dma.wait()

    for t, (dz, dy, dx) in enumerate((a, bb, c) for a in range(3)
                                     for bb in range(3) for c in range(3)):
        piece = slab_ref[:, dz:dz + dT, dy:dy + hT, dx:dx + W]
        col_ref[t * cin:(t + 1) * cin] = piece.reshape(cin, dT * hT, W)
    acc = jax.lax.dot_general(
        w_ref[:, :], col_ref[:, :, :],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # [cout, dT*hT, W]
    y_ref[0] = acc.reshape(cout, dT, hT, W).astype(out_dtype)
    # keep the reductions 2D: 1D vector writes trip Mosaic's layout
    # inference (layout.h assert) on this toolchain
    s = jnp.sum(acc, axis=2)                             # [cout, dT*hT]
    p_ref[0, 0, 0] = jnp.concatenate(
        [jnp.sum(s, axis=1, keepdims=True),
         jnp.sum(jnp.square(acc), axis=(2,)).sum(axis=1, keepdims=True)],
        axis=1).T                                        # [2, cout]


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def conv3d_direct_cf(xcf, w, out_dtype=jnp.bfloat16):
    """Channels-first direct conv: xcf [B, Cin, D, H, W], w [3,3,3,Cin,Cout].
    Returns (y [B, Cout, D, H, W] out_dtype, partials [B,nD,nH,2,Cout] f32:
    per-tile sums and sums-of-squares of the f32 conv result)."""
    B, cin, D, H, W = xcf.shape
    cout = w.shape[-1]
    tiles = _pick_tiles(D, H, W, cin, cout)
    assert tiles is not None, "unsupported shape — check supported() first"
    dT, hT = tiles
    nD, nH = D // dT, H // hT
    # DMA windows must respect the (8,128) tiling of the HBM memref: the
    # H window is rounded to 8 rows and the minor (W) extent to 128 lanes
    hslab = _pad(hT + 2, 8)
    wslab = _pad(W + 2, 128)
    xp = jnp.pad(xcf, ((0, 0), (0, 0), (1, 1), (1, hslab - hT - 1),
                       (1, wslab - W - 1)))
    # rows ordered (tap, cin) to match the col assembly above
    w_mat = w.astype(xcf.dtype).reshape(27 * cin, cout).T

    kern = functools.partial(_conv_kernel, dT=dT, hT=hT, W=W, cin=cin,
                             cout=cout, nD=nD, nH=nH, out_dtype=out_dtype)
    flops = 2 * B * D * H * W * cin * cout * 27
    y, partials = pl.pallas_call(
        kern,
        grid=(B, nD, nH),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((cout, 27 * cin), lambda b, i, j: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, cout, dT, hT, W), lambda b, i, j: (b, 0, i, j, 0)),
            pl.BlockSpec((1, 1, 1, 2, cout), lambda b, i, j: (b, i, j, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, cout, D, H, W), out_dtype),
            jax.ShapeDtypeStruct((B, nD, nH, 2, cout), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((cin, dT + 2, hslab, wslab), xcf.dtype),
            pltpu.VMEM((27 * cin, dT * hT, W), xcf.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=xcf.size * xcf.dtype.itemsize * 2,
            transcendentals=0),
    )(xp, w_mat)
    return y, partials


def conv3d_direct(x, w, out_dtype=jnp.bfloat16):
    """Channels-last wrapper: x [B, D, H, W, Cin] -> (y [B,D,H,W,Cout],
    partials). The two HBM transposes are the price for full-width VMEM
    assembly; prefer conv3d_in_lrelu which folds the output transpose into
    the normalization epilogue."""
    ycf, partials = conv3d_direct_cf(jnp.moveaxis(x, -1, 1), w,
                                     out_dtype=out_dtype)
    return jnp.moveaxis(ycf, 1, -1), partials


def _in_lrelu_epilogue(ycf, mean, inv, scale, offset, negative_slope, dt):
    mul = (inv * scale[None, :]).astype(dt)[:, :, None, None, None]
    sub = (mean * inv * scale[None, :] - offset[None, :]).astype(dt)[
        :, :, None, None, None]
    z = ycf * mul - sub
    z = jnp.where(z >= 0, z, negative_slope * z)
    return jnp.moveaxis(z, 1, -1)


def _fused_fwd_impl(x, w, scale, offset, negative_slope, epsilon, out_dtype,
                    plan):
    n = float(np.prod(x.shape[1:4]))
    if plan is None:
        ycf, partials = conv3d_direct_cf(jnp.moveaxis(x, -1, 1), w,
                                         out_dtype=out_dtype)
        s = jnp.sum(partials[:, :, :, 0, :], axis=(1, 2))   # [B, Cout]
        ss = jnp.sum(partials[:, :, :, 1, :], axis=(1, 2))
    else:
        # packed path: stats AFTER unpacking (exact; the guard lanes never
        # enter).  The extra read of y this costs is noise next to the conv.
        ycf_p, _ = conv3d_direct_cf(_pack_cl_to_cf(x, plan), w,
                                    out_dtype=out_dtype)
        ycf = _unpack_cf(ycf_p, plan, (x.shape[0], x.shape[1:4]))
        yf = ycf.astype(jnp.float32)
        s = jnp.sum(yf, axis=(2, 3, 4))
        ss = jnp.sum(jnp.square(yf), axis=(2, 3, 4))
    mean = s / n
    var = jnp.maximum(ss / n - jnp.square(mean), 0.0)
    inv = jax.lax.rsqrt(var + epsilon)                      # [B, Cout] f32
    out = _in_lrelu_epilogue(ycf, mean, inv, scale, offset, negative_slope,
                             out_dtype)
    return out, (ycf, mean, inv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _fused(x, w, scale, offset, negative_slope, epsilon, out_dtype, plan):
    return _fused_fwd_impl(x, w, scale, offset, negative_slope, epsilon,
                           out_dtype, plan)[0]


def _fused_fwd(x, w, scale, offset, negative_slope, epsilon, out_dtype, plan):
    out, (ycf, mean, inv) = _fused_fwd_impl(
        x, w, scale, offset, negative_slope, epsilon, out_dtype, plan)
    # NOT saving `out`: the LeakyReLU sign mask is recomputed in the backward
    # from (ycf, mean, inv, scale, offset) — a few elementwise ops instead of
    # keeping a second full feature map alive per fused block (~134 MB/block
    # at CT scale)
    return out, (x, w, scale, offset, ycf, mean, inv)


def _fused_bwd(negative_slope, epsilon, out_dtype, plan, res, g):
    """Analytic backward: LeakyReLU mask -> InstanceNorm backward (per
    batch,channel stats) -> dx via the SAME Pallas kernel with the flipped
    kernel (a 3^3 stride-1 conv again), dw via XLA's conv weight-grad."""
    x, w, scale, offset, ycf, mean, inv = res
    n = float(np.prod(x.shape[1:4]))
    gcf = jnp.moveaxis(g, -1, 1).astype(jnp.float32)
    yhat = (ycf.astype(jnp.float32) - mean[:, :, None, None, None]) \
        * inv[:, :, None, None, None]
    # recomputed pre-activation (f32); sign can differ from the emitted
    # out_dtype-rounded value only within rounding distance of 0, where the
    # two LeakyReLU branches coincide to first order
    z = yhat * scale[None, :, None, None, None] \
        + offset[None, :, None, None, None]
    dz = jnp.where(z >= 0, gcf, negative_slope * gcf)       # [B,C,D,H,W] f32
    dscale = jnp.sum(dz * yhat, axis=(2, 3, 4))             # [B, C] -> [C]
    doffset = jnp.sum(dz, axis=(2, 3, 4))
    m_dz = jnp.mean(dz, axis=(2, 3, 4), keepdims=True)
    m_dzy = jnp.mean(dz * yhat, axis=(2, 3, 4), keepdims=True)
    gi = (scale[None, :] * inv)[:, :, None, None, None]
    dy = (gi * (dz - m_dz - yhat * m_dzy)).astype(x.dtype)  # [B,C,D,H,W]

    # dx = conv(dy, flip(w) with cin/cout swapped) — same fused kernel shape
    w_flip = jnp.flip(w, axis=(0, 1, 2)).swapaxes(-1, -2)
    dy_cl = jnp.moveaxis(dy, 1, -1)
    if plan is not None:
        dxcf_p, _ = conv3d_direct_cf(_pack_cl_to_cf(dy_cl, plan), w_flip,
                                     out_dtype=x.dtype)
        dx = jnp.moveaxis(
            _unpack_cf(dxcf_p, plan, (x.shape[0], x.shape[1:4])), 1, -1)
    elif supported(dy_cl.shape, (3, 3, 3), (1, 1, 1)):
        dxcf, _ = conv3d_direct_cf(dy, w_flip, out_dtype=x.dtype)
        dx = jnp.moveaxis(dxcf, 1, -1)
    else:
        dx = jax.lax.conv_general_dilated(
            dy_cl, w_flip, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=x.dtype)

    # dw via XLA's conv weight-grad (its dW lowering is efficient: the
    # contraction is over the huge spatial dim, not the 32-lane channels);
    # all-f32 so the transpose rule sees uniform dtypes
    xf = x.astype(jnp.float32)
    _, pullback = jax.vjp(
        lambda ww: jax.lax.conv_general_dilated(
            xf, ww, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC")),
        w.astype(jnp.float32))
    (dw,) = pullback(jnp.moveaxis(dy, 1, -1).astype(jnp.float32))
    return dx, dw.astype(w.dtype), jnp.sum(dscale, axis=0), \
        jnp.sum(doffset, axis=0)


_fused.defvjp(_fused_fwd, _fused_bwd)


def conv3d_in_lrelu(x, w, scale, offset, negative_slope: float = 0.01,
                    epsilon: float = 1e-5, out_dtype=None):
    """Fused ConvNormAct: conv3d(3^3, SAME) -> InstanceNorm -> LeakyReLU.

    Drop-in for the XLA composition in ``models/unet.ConvNormAct`` (conv bias
    is mathematically absorbed by the IN mean subtraction, so none is taken).
    x is channels-last [B, D, H, W, Cin]; result is channels-last.
    Differentiable: a custom VJP runs dx through the same Pallas kernel
    (flipped weights) and dw through XLA's weight-grad lowering.

    Widths that are not 128-lane multiples route through the lane-packing
    plan (see ``pack_plan``).  When neither the direct nor a packed tiling
    exists for the shape (``eligible()`` checks with C = max(cin, cout) —
    use the same convention), this falls back to the plain XLA composition
    rather than crashing, so an ``eligible()`` check against a smaller C
    can never strand the caller.
    """
    B, D, H, W, cin = x.shape
    plan = None
    if W % 128:
        plan = pack_plan((B, D, H, W, max(cin, w.shape[-1])))
        if plan is None:
            y = jax.lax.conv_general_dilated(
                x, w.astype(x.dtype), (1, 1, 1), "SAME",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
            yf = y.astype(jnp.float32)
            nvox = float(np.prod(y.shape[1:4]))
            mean = jnp.sum(yf, (1, 2, 3)) / nvox
            var = jnp.maximum(
                jnp.sum(jnp.square(yf), (1, 2, 3)) / nvox - jnp.square(mean),
                0.0)
            inv = jax.lax.rsqrt(var + epsilon)
            dt = out_dtype or x.dtype
            z = (y * (inv * scale)[:, None, None, None, :].astype(dt)
                 - ((mean * inv * scale) - offset)[:, None, None, None, :]
                 .astype(dt))
            return jnp.where(z >= 0, z, negative_slope * z)
    return _fused(x, w, scale, offset, negative_slope, epsilon,
                  out_dtype or x.dtype, plan)
