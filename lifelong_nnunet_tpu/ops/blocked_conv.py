"""Spatial-blocked 3D conv: move big-volume convs into XLA's fast regime.

Motivation (measured on TPU v5e, results/r4/stage_scan_shapes.log): XLA's
3x3x3 SAME conv at C=32 runs at **11 TFLOP/s** on [b4, 128^3] but at
**83 TFLOP/s** on [b256, 32^3] — the SAME total voxels and FLOPs.  nnU-Net's
CT-scale stages (patch 128^3, C=32/64) sit squarely in the slow regime, and
they are where the forward's FLOPs live.  A naive halo-split (materialize
overlapping 34^3 windows, conv, reassemble — tools/ct_stage_scan.py
``split_conv_same``) loses the whole gain to gather/concat overhead
(9.4 vs 11.7 TFLOP/s direct at (2,2,2) splits).

This module packs cheaply instead:

  1. **reshape** each spatial axis into (n_blocks, block) — a free bitcast
     for the leading axes, one layout pass at most;
  2. **halo via edge-plane concat**: block i's upper halo plane IS block
     i-1's last plane, so ``concat([shift(blocks)[..., -1:], blocks,
     shift(blocks)[..., :1]])`` builds the halo moving only 2/block_size of
     the data per axis (zeros at volume borders reproduce SAME semantics);
  3. one transpose gathers the three block axes next to batch, and the conv
     runs **VALID** at batch B*n_blocks on small blocks — numerically
     identical to the SAME conv (the halo supplies exactly the neighbor/zero
     border each block needs).

Because consecutive 3x3x3 stride-1 convs appear in PAIRS in nnU-Net stages
(upstream ConvDropoutNormNonlin x2, reference
generic_UNet.py:StackedConvLayers), ``blocked_stage`` keeps the tensor in
blocked layout across the whole pair: pack -> conv -> InstanceNorm+LeakyReLU
(stats are exact: VALID outputs partition the volume) -> re-halo (concats
only, no transpose) -> conv -> unpack.  Pack/unpack amortize over two convs.

Everything here is plain linear XLA ops, so ``jax.grad`` differentiates
through it and the backward convs inherit the same fast blocked shapes.

Reference counterpart: upstream nnU-Net Generic_UNet conv blocks (the
reference trains/infers them via cuDNN at [b2, 128^3]); this is the TPU
layout that reaches the MXU's fast conv regime for those shapes.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


def _halo_axis(x, block_axis_n: int, block_axis_b: int):
    """Add a 1-plane halo along one blocked axis.

    x has a block-count axis ``block_axis_n`` (n blocks) and the matching
    within-block axis ``block_axis_b``.  The upper halo plane of block i is
    the last plane of block i-1 (zeros for i=0), the lower halo the first
    plane of block i+1 (zeros for the last block)."""
    n = x.shape[block_axis_n]
    last = lax.slice_in_dim(x, x.shape[block_axis_b] - 1,
                            x.shape[block_axis_b], axis=block_axis_b)
    first = lax.slice_in_dim(x, 0, 1, axis=block_axis_b)
    zeros = jnp.zeros_like(lax.slice_in_dim(last, 0, 1, axis=block_axis_n))
    prev = jnp.concatenate(
        [zeros, lax.slice_in_dim(last, 0, n - 1, axis=block_axis_n)],
        axis=block_axis_n)
    nxt = jnp.concatenate(
        [lax.slice_in_dim(first, 1, n, axis=block_axis_n), zeros],
        axis=block_axis_n)
    return jnp.concatenate([prev, x, nxt], axis=block_axis_b)


def pick_blocks(spatial, target: int = 32):
    """Per-axis block sizes: the divisor of each dim closest to ``target``
    (>= 16 to bound halo overhead), or None when no axis can split."""
    out = []
    for s in spatial:
        best = None
        for b in range(16, s + 1):
            if s % b:
                continue
            if best is None or abs(b - target) < abs(best - target):
                best = b
        if best is None:
            best = s
        out.append(best)
    if all(b == s for b, s in zip(out, spatial)):
        return None
    return tuple(out)


def block_with_halo(x, blocks):
    """[B, D, H, W, C] -> [B*nb, bd+2, bh+2, bw+2, C] halo'd blocks.

    Returns (xb, grid) with grid=(nd, nh, nw)."""
    B, D, H, W, C = x.shape
    bd, bh, bw = blocks
    nd, nh, nw = D // bd, H // bh, W // bw
    x = x.reshape(B, nd, bd, nh, bh, nw, bw, C)
    x = _halo_axis(x, 1, 2)                      # bd -> bd+2
    x = _halo_axis(x, 3, 4)                      # bh -> bh+2
    x = _halo_axis(x, 5, 6)                      # bw -> bw+2
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)      # [B,nd,nh,nw,bd+2,bh+2,bw+2,C]
    return x.reshape(B * nd * nh * nw, bd + 2, bh + 2, bw + 2, C), (nd, nh, nw)


def rehalo(yb, grid):
    """Re-add a 1-plane halo to VALID outputs already in blocked layout.

    yb: [B*nb, bd, bh, bw, C] (the VALID result of a conv over halo'd
    blocks).  Only edge planes move; no transpose."""
    nd, nh, nw = grid
    Bnb, bd, bh, bw, C = yb.shape
    B = Bnb // (nd * nh * nw)
    y = yb.reshape(B, nd, nh, nw, bd, bh, bw, C)
    y = _halo_axis(y, 1, 4)
    y = _halo_axis(y, 2, 5)
    y = _halo_axis(y, 3, 6)
    return y.reshape(Bnb, bd + 2, bh + 2, bw + 2, C)


def unblock(yb, grid):
    """[B*nb, bd, bh, bw, C] -> [B, D, H, W, C]."""
    nd, nh, nw = grid
    Bnb, bd, bh, bw, C = yb.shape
    B = Bnb // (nd * nh * nw)
    y = yb.reshape(B, nd, nh, nw, bd, bh, bw, C)
    y = y.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return y.reshape(B, nd * bd, nh * bh, nw * bw, C)


def _valid_conv(xb, w, strides=(1, 1, 1)):
    return lax.conv_general_dilated(
        xb, w, tuple(strides), "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def stride_ok(spatial, blocks, strides) -> bool:
    """A 1-voxel halo also covers k=3 STRIDE-2 axes under the upstream
    symmetric (1,1) padding: block offsets i*b are even for even b, so each
    block's output rows [i*b/2, (i+1)*b/2) read exactly input rows
    [i*b-1, i*b+b] — the halo'd block.  Requires even block size on strided
    axes."""
    for s, b, st in zip(spatial, blocks, strides):
        if st == 1:
            continue
        if st != 2 or b % 2 or s % b:
            return False
    return True


def blocked_conv_same(x, w, blocks=None, strides=(1, 1, 1)):
    """3x3x3 SAME/sym-padded conv == blocked VALID conv at large batch.

    x: [B, D, H, W, Cin] channels-last; w: [3,3,3,Cin,Cout]; strides per
    axis in {1, 2} (stride 2 matches the upstream symmetric k//2 padding
    grid — see models/unet._sym_pads)."""
    blocks = blocks or pick_blocks(x.shape[1:4])
    if blocks is None or not stride_ok(x.shape[1:4], blocks, strides):
        # symmetric k//2 padding == SAME at stride 1, and the upstream torch
        # grid at stride 2 (models/unet._sym_pads)
        return lax.conv_general_dilated(
            x, w, tuple(strides), [(1, 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    xb, grid = block_with_halo(x, blocks)
    return unblock(_valid_conv(xb, w, strides), grid)


def _in_lrelu(yb, s, ss, nvox, scale, offset, negative_slope, epsilon, dt):
    """InstanceNorm+LeakyReLU from precomputed per-(B,C) sums (exact)."""
    mean = s / nvox
    var = jnp.maximum(ss / nvox - jnp.square(mean), 0.0)
    inv = lax.rsqrt(var + epsilon)
    mul = (inv * scale[None, :]).astype(dt)
    sub = ((mean * inv * scale[None, :]) - offset[None, :]).astype(dt)
    z = yb * mul[:, None, None, None, :] - sub[:, None, None, None, :]
    return jnp.where(z >= 0, z, negative_slope * z)


def _blocked_stats(yb, grid, B):
    """Exact per-(B, C) sum / sum-of-squares from blocked VALID outputs
    (every output voxel appears in exactly one block)."""
    nb = int(np.prod(grid))
    yf = yb.astype(jnp.float32)
    s = jnp.sum(yf, axis=(1, 2, 3)).reshape(B, nb, -1).sum(axis=1)
    ss = jnp.sum(jnp.square(yf), axis=(1, 2, 3)).reshape(B, nb, -1).sum(axis=1)
    return s, ss


def blocked_stage(x, w1, scale1, offset1, w2, scale2, offset2,
                  negative_slope: float = 0.01, epsilon: float = 1e-5,
                  blocks=None, out_dtype=None, stride1=(1, 1, 1)):
    """Two fused (conv3x3 -> InstanceNorm -> LeakyReLU) layers computed in
    blocked layout end-to-end: pack, conv1 (optionally strided — the
    downsampling conv of an encoder stage), IN+act, re-halo, conv2, IN+act,
    unpack.  Matches the XLA/Pallas ConvNormAct pair numerically (IN stats
    are exact — see _blocked_stats).

    x: [B, D, H, W, Cin]; w1: [3,3,3,Cin,Cm]; w2: [3,3,3,Cm,Cout]."""
    dt = out_dtype or x.dtype
    B = x.shape[0]
    spatial = x.shape[1:4]
    blocks = blocks or pick_blocks(spatial)
    if blocks is None or not stride_ok(spatial, blocks, stride1):
        raise ValueError(f"no usable blocking for {spatial} stride {stride1}")
    nvox1 = float(np.prod([s // st for s, st in zip(spatial, stride1)]))
    nvox2 = nvox1
    xb, grid = block_with_halo(x, blocks)
    y1 = _valid_conv(xb, w1.astype(x.dtype), stride1)
    s1, ss1 = _blocked_stats(y1, grid, B)
    # broadcast per-(B,C) stats to per-block rows: repeat along the block dim
    nb = int(np.prod(grid))
    rep = lambda a: jnp.repeat(a, nb, axis=0)
    z1 = _in_lrelu(y1, rep(s1), rep(ss1), nvox1, scale1, offset1,
                   negative_slope, epsilon, dt)
    z1h = rehalo(z1, grid)
    y2 = _valid_conv(z1h, w2.astype(dt))
    s2, ss2 = _blocked_stats(y2, grid, B)
    z2 = _in_lrelu(y2, rep(s2), rep(ss2), nvox2, scale2, offset2,
                   negative_slope, epsilon, dt)
    return unblock(z2, grid)


def aniso_blocks(spatial, strides=(1, 1, 1), target: int = 32,
                 min_grid: int = 4):
    """W-whole anisotropic blocking plan: split only D/H, keep W intact.

    The isotropic pack lost its regime gain to XLA's minor-dim data movement
    (the W-axis halo concat moves 64-byte slivers and the pack transpose
    touches the minor dims — results/r4/stage_scan_blocked.log).  Keeping W
    whole makes every halo concat a contiguous >=8KB plane copy and the pack
    transpose a major-axis permutation, while still multiplying the conv's
    effective batch by (D/bd)*(H/bh).

    Returns (bd, bh, W) or None when no useful blocking exists (axis not
    divisible, stride-2 axis without an even block, or too few blocks for
    the regime change to pay for the pack)."""
    D, H, W = spatial

    def pick(s, st):
        # largest PROPER divisor <= target: halo overhead per axis is
        # (b+2)/b, so bigger blocks are cheaper; blocks beyond target stop
        # helping the batch-regime change that motivates the pack.  Falls
        # back to the whole axis (no split) only when nothing divides it.
        best = None
        for b in range(8, min(s - 1, target) + 1):
            if s % b or (st == 2 and b % 2):
                continue
            if best is None or b > best:
                best = b
        if best is None and 8 <= s <= target and not (st == 2 and s % 2):
            best = s
        return best

    bd = pick(D, strides[0])
    bh = pick(H, strides[1])
    if bd is None or bh is None:
        return None
    if (D // bd) * (H // bh) < min_grid:
        return None
    if strides[2] == 2 and W % 2:
        return None
    return (bd, bh, W)
