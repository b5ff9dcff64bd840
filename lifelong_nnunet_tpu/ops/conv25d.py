"""2.5D decomposition of the 3D conv: one batched 2D conv + a D shift-add.

Why this exists (round-4 CT perf attack): XLA's TPU conv3d runs the CT
path's [b<=8, 128^3, C32] stages at ~9-11 TFLOP/s while the SAME conv at
[b256, 32^3, C32] reaches 83 TFLOP/s (results/r4/stage_scan_shapes.log) —
the slow regime is large-spatial 3D geometry, not the channel count.  Every
route that *packs* the volume into small blocks pays for the layout change:
XLA reshape+concat packing lands at 6-8 TFLOP/s end-to-end and the Pallas
DMA pack kernels plateau at ~24 GB/s (results/r4/stage_scan_blocked.log,
repro_pack_pipe.log).

This module changes the *operation* instead of the *layout*:

    conv3d(x, w)[n, do, :, :, co]
        = sum_kd conv2d(x[n, do*sd - pd + kd], w[kd])[:, :, co]

With channel-minor NDHWC activations, folding D into batch is a FREE
reshape — (N, D, H, W, C) and (N*D, H, W, C) are the same bytes.  The kd
taps become extra output-channel groups of ONE large-batch conv2d
(kh, kw, Ci, kd*Co), and the kd-reduction is a cheap strided shift-add
along D (3 reads + 1 write of the output, fully fusable by XLA).  No
halos, no data movement, identical FLOPs, and the conv2d runs at
[batch N*D, 128^2, C32] — 2D geometry XLA tiles well.

Everything here is plain lax — autodiff gives the backward pass (conv2d
data/weight grads at the same large batch; the shift-add transposes to
pad/slice), so no custom VJP is needed.

Reference parity target: the torch 3x3x3/stride convs of upstream
Generic_UNet (reference nnunet generic_UNet.py) with symmetric k//2
padding — numerics match the direct lax conv3d to bf16 rounding (the kd
partial sums round to bf16 once each before a f32 shift-add; the direct
conv rounds once after a full f32 accumulation).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax


def _conv2d_phase_strided(x2: jax.Array, w2: jax.Array,
                          sh: int, sw: int) -> jax.Array:
    """Stride-2 conv2d re-expressed as stride-1 convs on phase-merged views.

    XLA's strided conv2d at large batch runs the CT downsamples at
    ~0.3-0.5 T/s (results/r4/stage_scan_conv25d.log s2 rows,
    ab_upsample.log) while the SAME-shape stride-1 conv reaches 25-45 T/s.
    The fix never materializes a strided gather:

      * W stride 2: ``(..., W, C) -> (..., W/2, 2C)`` is a FREE view
        (pure index split); the even/odd column taps become channel
        halves of a kernel-width-2 stride-1 conv.
      * H stride 2: even/odd row planes are strided slices along a
        *major* axis — contiguous (W/2 * 2C)-element runs (8 KB at CT
        scale), not the 64-byte relayout wall — feeding two stride-1
        convs (kh=1 for the center tap row, kh=2 for the +/-1 rows)
        that sum.

    Dense-FLOP overhead vs the ideal strided conv: 12C vs 9C MACs per
    output (the merged kernels carry a few structurally-zero C-blocks) —
    a 4/3 cost for a measured ~50x regime win.  Exact (zeros contribute
    nothing); autodiff gives the backward pass through the same views.

    x2: (B, H, W, C); w2: (3, 3, C, Co); SAME-symmetric (k//2) padding;
    sh, sw in {1, 2}; H even when sh==2, W even when sw==2.
    """
    B, H, W, C = x2.shape
    kh, kw, ci, Co = w2.shape
    assert (kh, kw) == (3, 3) and ci == C
    dn = ("NHWC", "HWIO", "NHWC")
    z = jnp.zeros((C, Co), w2.dtype)

    if sw == 2:
        assert W % 2 == 0
        xv = x2.reshape(B, H, W // 2, 2 * C)
        # col-merged kernel rows: for source-row tap th, the three column
        # taps land in (block ow-1, odd half) / (block ow, even) /
        # (block ow, odd); merged channel layout is [even C | odd C]
        def col_merge(th):
            # (2 blocks, 2C, Co)
            b0 = jnp.concatenate([z, w2[th, 0]], axis=0)        # block ow-1
            b1 = jnp.concatenate([w2[th, 1], w2[th, 2]], axis=0)  # block ow
            return jnp.stack([b0, b1], axis=0)                  # (2, 2C, Co)
        k3 = jnp.stack([col_merge(t) for t in range(3)], axis=0)  # (3,2,..)
        if sh == 2:
            assert H % 2 == 0
            # H stride stays NATIVE in the conv (stride (2,1)): the measured
            # pathology of strided convs is the MINOR-axis (W) stride
            # breaking dense vector loads — the W-merge removes it, and a
            # major-axis H stride is benign.  (The explicit xe/xo H-phase
            # split variant measured 20.8 ms of relayout-wall slicing at
            # s0->s1 scale — results/r5/upt_probe3.log phase-slice-only.)
            return lax.conv_general_dilated(
                xv, k3, (2, 1), [(1, 1), (1, 0)], dimension_numbers=dn)
        return lax.conv_general_dilated(
            xv, k3, (1, 1), [(1, 1), (1, 0)], dimension_numbers=dn)

    assert sh == 2 and H % 2 == 0
    xe, xo = x2[:, 0::2], x2[:, 1::2]
    ye = lax.conv_general_dilated(
        xe, w2[1:2], (1, 1), [(0, 0), (1, 1)], dimension_numbers=dn)
    yo = lax.conv_general_dilated(
        xo, w2[::2], (1, 1), [(1, 0), (1, 1)], dimension_numbers=dn)
    return ye + yo


def _phase_strided_ok(H: int, W: int, kh: int, kw: int,
                      sh: int, sw: int) -> bool:
    return ((kh, kw) == (3, 3) and sh in (1, 2) and sw in (1, 2)
            and (sh, sw) != (1, 1)
            and (sh == 1 or H % 2 == 0) and (sw == 1 or W % 2 == 0))


def conv3d_slicewise(x: jax.Array, w: jax.Array,
                     stride: Sequence[int] = (1, 1, 1),
                     accum_dtype=jnp.float32) -> jax.Array:
    """SAME-symmetric (k//2 per axis) 3D conv via batched conv2d + shift-add.

    x: (N, D, H, W, Ci) channel-minor; w: (kd, kh, kw, Ci, Co).
    Returns (N, Do, Ho, Wo, Co) in x.dtype.  Matches
    ``lax.conv_general_dilated(x, w, stride, sym_pads, NDHWC)`` up to
    bf16 partial-sum rounding (exact in f32).
    """
    N, D, H, W, Ci = x.shape
    kd, kh, kw, ci, Co = w.shape
    assert ci == Ci, (x.shape, w.shape)
    sd, sh, sw = tuple(int(s) for s in stride)
    pd, ph, pw = kd // 2, kh // 2, kw // 2

    x2 = x.reshape(N * D, H, W, Ci)                 # free: D is batch-adjacent
    # (kd, kh, kw, Ci, Co) -> (kh, kw, Ci, kd*Co): kd taps as channel groups
    w2 = jnp.moveaxis(w, 0, 3).reshape(kh, kw, Ci, kd * Co).astype(x.dtype)
    if _phase_strided_ok(H, W, kh, kw, sh, sw):
        # strided conv2d at large batch is the 0.3-0.5 T/s pathology
        # (results/r4 s2 rows); the phase-merged stride-1 formulation
        # stays in the fast regime
        y2 = _conv2d_phase_strided(x2, w2, sh, sw)
    else:
        y2 = lax.conv_general_dilated(
            x2, w2, (sh, sw), [(ph, ph), (pw, pw)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    Ho, Wo = y2.shape[1], y2.shape[2]
    if kd == 1:                                     # pure per-slice conv
        y = y2.reshape(N, D, Ho, Wo, Co)
        return y[:, ::sd] if sd > 1 else y

    y2 = y2.reshape(N, D, Ho, Wo, kd, Co)
    Do = (D + 2 * pd - kd) // sd + 1
    # out[:, do] = sum_kd y2[:, do*sd - pd + kd, ..., kd, :]  (zero outside)
    y2p = jnp.pad(y2, ((0, 0), (pd, pd), (0, 0), (0, 0), (0, 0), (0, 0)))
    acc = None
    for k in range(kd):
        part = lax.slice_in_dim(y2p, k, k + (Do - 1) * sd + 1,
                                stride=sd, axis=1)[..., k, :]
        part = part.astype(accum_dtype)
        acc = part if acc is None else acc + part
    return acc.astype(x.dtype)


def conv25d_in_lrelu(x: jax.Array, w: jax.Array,
                     scale: jax.Array, offset: jax.Array,
                     negative_slope: float = 0.01,
                     out_dtype=jnp.bfloat16,
                     strides: Sequence[int] = (1, 1, 1)) -> jax.Array:
    """Fused-semantics block: conv3d_slicewise -> InstanceNorm -> LeakyReLU.

    Same contract as ops/pallas/conv3d.conv3d_in_lrelu / block_pack's fused
    stage: the conv bias is omitted (InstanceNorm absorbs any per-channel
    additive term exactly), IN statistics are f32 over (D, H, W) per (N, C).
    """
    y = conv3d_slicewise(x, w, strides)
    # one-pass f32 statistics (mean(x^2) - mean^2) matching models/unet.
    # InstanceNorm: the convert+square fuse INTO the reduction so no f32
    # copy of the feature map is materialized (the two-pass (x-mean)
    # formulation held ~2 GB f32 temps per stage at CT scale and this
    # route targets exactly the biggest tensors); normalization arithmetic
    # stays in the compute dtype.
    yf = y.astype(jnp.float32)
    mean = jnp.mean(yf, axis=(1, 2, 3), keepdims=True)
    var = jnp.mean(jnp.square(yf), axis=(1, 2, 3), keepdims=True) \
        - jnp.square(mean)
    inv = lax.rsqrt(jnp.maximum(var, 0.0) + 1e-5)
    dt = y.dtype
    yn = (y - mean.astype(dt)) * (inv.astype(dt) * scale.astype(dt)) \
        + offset.astype(dt)
    return jnp.where(yn >= 0, yn, yn * negative_slope).astype(out_dtype)


def conv3d_phase_strided(x: jax.Array, w: jax.Array,
                         interpret: bool = False) -> jax.Array:
    """Stride-2 3x3x3 conv as FOUR stride-1 convs on Pallas phase fields.

    Every direct formulation of the stride-2 downsample measured
    pathological on chip (direct XLA 2.5-4.9 T/s at s0->s1; native-H /
    XLA phase slices 0.5 T/s — results/r5 probes), while the SAME-shape
    stride-1 convs run at 28-50 T/s.  This route:

      1. splits x into its 4 (D-parity, H-parity) phase fields with the
         Pallas contiguous-DMA kernel (ops/pallas/interleave.
         phase_split_dh — XLA's own lowering of that split is the 20.8 ms
         relayout wall, the kernel is pure bandwidth);
      2. takes W parity as a FREE (W/2, 2C) channel view;
      3. maps each kernel tap (td, th, tw) to exactly one (phase, block
         offset) pair — giving per-phase stride-1 convs with kernels of
         size (kd_i<=2, kh_j<=2, 2) whose channel structure carries the W
         parity (structural zeros: 4/3 dense-FLOP overhead);
      4. folds D/2 into the conv2d batch (kd taps as channel groups) and
         reduces D blocks with a contiguous pad/slice shift-add.

    Exact vs ``lax.conv_general_dilated(x, w, (2,2,2), sym pads)`` for
    even D/H/W; differentiable end-to-end (conv adjoints + the
    de-interleave custom VJP whose backward is the interleave kernel).
    """
    N, D, H, W, Ci = x.shape
    kd, kh, kw, ci, Co = w.shape
    assert (kd, kh, kw) == (3, 3, 3) and ci == Ci
    assert D % 2 == 0 and H % 2 == 0 and W % 2 == 0
    from .pallas.interleave import phase_split_dh
    parts = phase_split_dh(x, interpret)     # a_ij: (N, D/2, H/2, W, Ci)
    Do, Ho, Wo = D // 2, H // 2, W // 2
    w = w.astype(x.dtype)
    zc = jnp.zeros((Ci, Co), w.dtype)

    def wmerge(sub):
        """(kd', kh', 3, Ci, Co) -> 2D kernel (kh', 2, 2Ci, kd'*Co) with W
        parity in merged channels and kd' taps as output-channel groups."""
        kdp, khp = sub.shape[0], sub.shape[1]
        # W-tap structure: pos0 (block wo-1): [0 | w_tw0]; pos1 (block wo):
        # [w_tw1 | w_tw2]   (merged channel layout [even Ci | odd Ci])
        z = jnp.broadcast_to(zc, (kdp, khp, Ci, Co))
        pos0 = jnp.concatenate([z, sub[:, :, 0]], axis=2)
        pos1 = jnp.concatenate([sub[:, :, 1], sub[:, :, 2]], axis=2)
        k4 = jnp.stack([pos0, pos1], axis=2)      # (kd', kh', 2, 2Ci, Co)
        # kd' taps -> output channel groups: (kh', 2, 2Ci, kd'*Co)
        return jnp.moveaxis(k4, 0, 3).reshape(khp, 2, 2 * Ci, kdp * Co)

    out = None
    for i in range(2):
        d_sub = w[1:2] if i == 0 else jnp.stack([w[0], w[2]])
        for j in range(2):
            sub = d_sub[:, 1:2] if j == 0 \
                else jnp.stack([d_sub[:, 0], d_sub[:, 2]], axis=1)
            kdp, khp = sub.shape[0], sub.shape[1]
            k2 = wmerge(sub)
            a = parts[2 * i + j].reshape(N * Do, Ho, Wo, 2 * Ci)
            y2 = lax.conv_general_dilated(
                a, k2, (1, 1), [(1, 0) if j == 1 else (0, 0), (1, 0)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y2 = y2.reshape(N, Do, Ho, Wo, kdp, Co)
            if i == 0:
                y = y2[..., 0, :]
            else:
                # out[bd] = part_w0[bd-1] + part_w2[bd]
                p0 = jnp.pad(y2[..., 0, :],
                             ((0, 0), (1, 0), (0, 0), (0, 0), (0, 0)))
                y = p0[:, :Do] + y2[..., 1, :]
            yf = y.astype(jnp.float32)
            out = yf if out is None else out + yf
    return out.astype(x.dtype)


def phase_strided_eligible(x_shape, kernel, stride, dtype) -> bool:
    """Routing gate for conv3d_phase_strided: TPU, 3^3 kernel, full
    stride 2, even dims, lane-aligned W*C, big-volume regime."""
    import jax as _jax
    if _jax.default_backend() not in ("tpu", "axon"):
        return False
    if len(x_shape) != 5 or tuple(kernel) != (3, 3, 3) \
            or tuple(stride) != (2, 2, 2):
        return False
    from .pallas.interleave import phase_split_ok
    if not phase_split_ok(x_shape, dtype):
        return False
    d, h, wdim = x_shape[1:4]
    return d * h * wdim >= (1 << 18) and x_shape[0] * d >= 64


def conv25d_in_lrelu_pair(x1: jax.Array, x2: jax.Array, w: jax.Array,
                          scale: jax.Array, offset: jax.Array,
                          negative_slope: float = 0.01,
                          out_dtype=jnp.bfloat16,
                          strides: Sequence[int] = (1, 1, 1)) -> jax.Array:
    """Concat-free skip fusion: ``conv(concat([x1, x2]), w)`` ==
    ``conv(x1, w[..., :C1, :]) + conv(x2, w[..., C1:, :])`` (convolution is
    linear in channels), followed by the same fused IN+LReLU.

    The channel concat at decoder scale materializes ~0.5-1 GB from
    64-128-byte interleaved runs (the relayout wall); the split-weight
    form never builds it, and each partial conv runs in the 2.5D fast
    regime.  Exact vs the concat formulation (fp32 summation order aside).
    """
    c1 = x1.shape[-1]
    y = conv3d_slicewise(x1, w[..., :c1, :], strides) \
        + conv3d_slicewise(x2, w[..., c1:, :], strides)
    yf = y.astype(jnp.float32)
    mean = jnp.mean(yf, axis=(1, 2, 3), keepdims=True)
    var = jnp.mean(jnp.square(yf), axis=(1, 2, 3), keepdims=True) \
        - jnp.square(mean)
    inv = lax.rsqrt(jnp.maximum(var, 0.0) + 1e-5)
    dt = y.dtype
    yn = (y - mean.astype(dt)) * (inv.astype(dt) * scale.astype(dt)) \
        + offset.astype(dt)
    return jnp.where(yn >= 0, yn, yn * negative_slope).astype(out_dtype)


def conv_transpose3d_slicewise(x: jax.Array, w: jax.Array,
                               stride: Sequence[int]) -> jax.Array:
    """kernel==stride ConvTranspose (the U-Net decoder upsample) via
    per-D-tap batched 2D transposed convs + a contiguous D-interleave.

    HISTORY: written against r4 one-shot timings that put the direct
    conv_transpose at ~0.9 T/s — later shown to be the relay's
    per-dispatch floor, not the op.  Clean chained numbers
    (results/r5/upt_probe2.log) put direct at 7.8 ms vs 9.7 ms for this
    route at b4 64^3 C64->32, so the DIRECT path is the default
    (LNN_UPT_MODE); this stays as a selectable exact alternative.

    Matches ``lax.conv_transpose(x, w, stride, "VALID", NDHWC)`` exactly
    (k==s means taps don't overlap; tap order verified by test).
    """
    N, D, H, W, Ci = x.shape
    kd, kh, kw, ci, Co = w.shape
    sd, sh, sw = tuple(int(s) for s in stride)
    assert (kd, kh, kw) == (sd, sh, sw), "k==s upsampling only"
    assert ci == Ci
    x2 = x.reshape(N * D, H, W, Ci)
    w = w.astype(x.dtype)
    if kd == 1:
        y = lax.conv_transpose(x2, w[0], (sh, sw), "VALID",
                               dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y.reshape(N, D, sh * H, sw * W, Co)
    # lax.conv_transpose (transpose_kernel=False) flips spatial taps; the
    # D flip must be applied by hand since D is decomposed out
    outs = [lax.conv_transpose(x2, w[kd - 1 - i], (sh, sw), "VALID",
                               dimension_numbers=("NHWC", "HWIO", "NHWC"))
            for i in range(kd)]
    y = jnp.stack(outs, axis=1)          # (N*D, kd, H', W', Co) — 1MB blocks
    return y.reshape(N, sd * D, sh * H, sw * W, Co)


def conv_transpose3d_matmul(x: jax.Array, w: jax.Array,
                            stride: Sequence[int]) -> jax.Array:
    """k==s=2 ConvTranspose as 4 octant-pair matmuls with a FREE W-merge.

    The W-axis interleave is the only one that can be made literally free:
    with output channels ordered (k, c), ``(..., W, k*c) -> (..., 2W, c)``
    is the identity permutation of linear memory.  So: one matmul per
    (i, j) D/H-tap pair emitting (k, c) channel groups (free W-merge
    each), then an H-stack of contiguous (2W*c) runs and a D-stack of
    (2H*2W*c) runs.

    Round-5 verdict (results/r5/upt_probe2.log, chained): the 4 skinny
    K=Cin matmuls alone cost 5.6 ms at b4 64^3 C64->32 — more than the
    direct conv_transpose's whole 7.8 ms can be beaten by — so this stays
    a selectable alternative (LNN_UPT_MODE=matmul), not the default.

    Exact for k==s (taps never overlap; lax.conv_transpose flips all
    spatial taps — delta-probe verified).  Gradient is 4 matmul
    transposes + slice adjoints (autodiff).
    """
    N, D, H, W, Ci = x.shape
    kd, kh, kw, ci, Co = w.shape
    assert (kd, kh, kw) == tuple(stride) == (2, 2, 2), "2x upsample only"
    assert ci == Ci
    x2 = x.reshape(N * D, H, W, Ci)
    w = w.astype(x.dtype)
    rows = []
    for i in range(2):
        cols = []
        for j in range(2):
            # lax.conv_transpose (transpose_kernel=False) flips ALL spatial
            # taps: out[2d+i, 2h+j, 2w+k] = x[d,h,w] @ w[1-i, 1-j, 1-k]
            # (delta-input probe, round 5); select the (1-i, 1-j) plane and
            # reverse k so the merged channel order is still (k, c)
            # (Ci, k*Co) with k outer of Co — the free-merge ordering
            wij = w[1 - i, 1 - j, ::-1].transpose(1, 0, 2).reshape(
                Ci, 2 * Co)
            yij = (x2 @ wij).reshape(N * D, H, 2 * W, Co)
            cols.append(yij)
        # H-interleave: contiguous (2W*Co) runs per (n*d, h)
        hi = jnp.stack(cols, axis=2).reshape(N * D, 2 * H, 2 * W, Co)
        rows.append(hi)
    # D-interleave: contiguous (2H*2W*Co) runs per (n*d)
    z = jnp.stack(rows, axis=1)
    return z.reshape(N, 2 * D, 2 * H, 2 * W, Co)


def upsample_eligible(x_shape: Tuple[int, ...], kernel: Sequence[int],
                      stride: Sequence[int]) -> bool:
    """Shape gate for the 2.5D transposed-conv route: 3D k==s upsamples
    with enough slices to batch; the tiny deep-decoder levels stay on
    lax.conv_transpose (measured fine at 32^3-and-below b2)."""
    if len(x_shape) != 5 or len(kernel) != 3:
        return False
    if tuple(kernel) != tuple(stride):
        return False
    d, h, wdim = x_shape[1:4]
    # the slow regime is the large-spatial upsample: >=256k voxels/item out
    out_vox = d * h * wdim
    for s in stride:
        out_vox *= int(s)
    return out_vox >= (1 << 18) and x_shape[0] * d >= 32


def eligible(x_shape: Tuple[int, ...], kernel: Sequence[int],
             stride: Sequence[int], cin: int, cout: int) -> bool:
    """Shape gate for the 2.5D route (measured regimes, RESULTS.md rounds
    4-5).

    * Large volumes (>=256k voxels/item, 64^3 up): wins at every measured
      cin up to 192 with cout<=64 — including the decoder's skip-concat
      convs (128^3 C96->32: 28.3 vs 16.3 T/s; 64^3 C192->64: 49.6 vs 30.0;
      results/r5/upt_probe5.log), which round 4's max(cin,cout)<=64 rule
      wrongly excluded (the dec0 conv is ~1.4 TFLOP at CT b4 — the single
      biggest op in the forward).
    * Hippocampus-scale volumes (>=64k voxels/item): wins only for the
      narrow C<=32 stages (40x56x40 C32->32: 2.44 vs 3.13 ms b4, 6.15 vs
      6.83 b9); C64 loses at small batch and Cin=1 loses outright
      (results/r5/upt_probe3.log, upt_probe5.log) — both stay on XLA.
    * Strided convs stay excluded: every strided formulation measured
      pathological at C32 (direct 4.8 T/s is the best known;
      phase-merged/native-H 0.5 T/s — r5 probes).
    """
    if len(x_shape) != 5 or len(kernel) != 3:
        return False
    kd, kh, kw = kernel
    if (kd, kh, kw) not in ((3, 3, 3), (1, 3, 3)):
        return False
    if any(s != 1 for s in stride):
        return False
    d, h, wdim = x_shape[1:4]
    vox = d * h * wdim
    if x_shape[0] * d < 64:
        return False
    if vox >= (1 << 18):
        return cin <= 192 and cout <= 64
    if vox >= (1 << 16):
        # training-batch regime only (measured at b4/b9, 2D batch 160-360):
        # at serving batch (TTA x window/volume batching, 2D batch 2.5k+)
        # XLA's conv3d is already in its fast large-batch regime (41.6 T/s,
        # RESULTS.md round 2) and the huge batched conv2d triggered a
        # remote-compile failure on the hippocampus serve program (r5)
        return x_shape[0] * d <= 512 and 8 <= cin \
            and max(cin, cout) <= 32
    return False
