"""Plans-driven generic U-Net (2D/3D) — TPU-native counterpart of the
reference's ``Generic_UNet`` (upstream nnU-Net architecture; the reference's
shim at ``nnunet_ext/network_architecture/generic_UNet.py:12-51`` only
re-registers submodules in topological order for dot-path splitting — here
topological order is structural: see MODULE_ORDER / `module_order`).

Architecture (matches the upstream contract, SURVEY.md §2.8):
  * encoder: per resolution stage, two conv→InstanceNorm→LeakyReLU(0.01)
    blocks; downsampling via the first conv's stride (strided conv, no pools)
  * features double per stage from ``base_num_features`` (32), capped at
    ``max_num_features`` (320 for 3D / 512 for 2D)
  * decoder: transpose-conv upsampling (kernel=stride=pool kernel), skip
    concat, two conv blocks
  * one 1×1 seg head per decoder stage → deep supervision outputs, returned
    highest-resolution-first

TPU-first choices:
  * channels-last (NDHWC) layout — XLA's native conv layout on TPU
  * ``dtype`` controls compute precision (bfloat16 on TPU); params and
    InstanceNorm statistics stay float32
  * everything is shape-static; the plans freeze patch geometry per task
    family (reference invariant, ``model_restore.py:120-134``)
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class InstanceNorm(nn.Module):
    """Per-sample, per-channel normalization over spatial dims (affine).
    Stats computed in float32 regardless of compute dtype."""
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        spatial_axes = tuple(range(1, x.ndim - 1))
        # one-pass f32 statistics: the convert+square fuse INTO the reduction,
        # so no f32 copy of the feature map is materialized (a two-pass
        # (x-mean) formulation held 2 GB f32 temps per conv stage at CT
        # scale); normalization arithmetic stays in the compute dtype.
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=spatial_axes, keepdims=True)
        var = jnp.mean(jnp.square(xf), axis=spatial_axes, keepdims=True) \
            - jnp.square(mean)
        inv = jax.lax.rsqrt(jnp.maximum(var, 0.0) + self.epsilon)
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],), jnp.float32)
        dt = self.dtype
        return ((x.astype(dt) - mean.astype(dt)) * (inv * scale).astype(dt)
                + bias.astype(dt))


class _ConvParams(nn.Module):
    """Parameter holder matching nn.Conv's scope layout (kernel/bias) so the
    Pallas fused path below keeps the exact checkpoint tree; the bias is
    declared but unused there — it is mathematically absorbed by the
    InstanceNorm mean subtraction."""
    kshape: tuple

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.he_normal(), self.kshape,
                       jnp.float32)
        self.param("bias", nn.initializers.zeros, (self.kshape[-1],),
                   jnp.float32)
        return k


class _INParams(nn.Module):
    """Parameter holder matching InstanceNorm's scope layout (scale/bias)."""
    features: int

    @nn.compact
    def __call__(self):
        s = self.param("scale", nn.initializers.ones, (self.features,),
                       jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
        return s, b


def _sym_pads(kernel):
    """Symmetric k//2 zero padding per spatial axis — the upstream contract
    (reference ``generic_UNet`` blocks pad ``conv_pad_sizes = k//2`` on both
    sides, torch Conv semantics).  For odd kernels this yields the same
    output shape as XLA's "SAME" at every stride, but at stride>1 "SAME"
    pads asymmetrically ((0,1) for k=3,s=2), sampling a grid shifted by one
    voxel relative to the reference — symmetric padding makes the strided
    downsampling grid (and thus the whole forward) match torch exactly
    (tests/test_model_parity_torch.py)."""
    return tuple((k // 2, k // 2) for k in kernel)


def _int8_conv(x, w, stride):
    """Dynamically-quantized int8 conv whose output feeds InstanceNorm.

    Symmetric per-tensor activation scale + per-output-channel weight scale.
    Because InstanceNorm follows, NO dequantization is needed: a per-channel
    multiplicative factor and the conv bias are both exactly absorbed by the
    normalization (IN(a_c·y_c + b_c) = IN(y_c)), so the int32 accumulator is
    handed to IN directly and the only inexactness is the 8-bit rounding of
    x and w.  SAME zero-padding is exact under symmetric quantization.
    v5e int8 peak is 2x bf16; measured wins at C>=64 (RESULTS.md)."""
    xf = x.astype(jnp.float32)
    ax = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-12)
    xq = jnp.clip(jnp.round(xf * (127.0 / ax)), -127, 127).astype(jnp.int8)
    wf = w.astype(jnp.float32)
    aw = jnp.maximum(jnp.max(jnp.abs(wf), axis=(0, 1, 2, 3), keepdims=True),
                     1e-12)
    wq = jnp.clip(jnp.round(wf * (127.0 / aw)), -127, 127).astype(jnp.int8)
    return jax.lax.conv_general_dilated(
        xq, wq, window_strides=tuple(stride),
        padding=_sym_pads(w.shape[:3]),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.int32)


class ConvNormAct(nn.Module):
    """conv → InstanceNorm → LeakyReLU(0.01): the upstream
    ``ConvDropoutNormNonlin`` with dropout p=0 (nnU-Net default).

    ``pallas_conv=True`` routes eligible shapes (3x3x3, stride 1, C<=64,
    bf16, on TPU) through the fused Pallas kernel
    (``ops/pallas/conv3d.conv3d_in_lrelu``, measured 1.35x faster than the
    XLA composition at CT scale; differentiable — its custom VJP reuses the
    kernel for dx). The parameter tree is identical either way (see
    _ConvParams/_INParams), so checkpoints are flag-agnostic. NOTE: the
    pallas path ignores the conv bias param (exact: IN absorbs it), so its
    gradient is zero there — fine for training from scratch with IN.

    ``int8_min_ch=N`` (inference-only) additionally routes stages with
    min(Cin, Cout) >= N through a dynamically-quantized int8 conv (see
    _int8_conv) — the mixed-precision path VERDICT r2 #4 asks to probe.
    Checked before the Pallas route so the two compose per-stage: int8 for
    the wide stages, the fused bf16 kernel for eligible narrow ones.

    ``blocked_conv=True`` routes big-volume C<=64 3x3x3 stages through the
    DMA-packed fast-regime conv (ops/pallas/block_pack) — see _packed_bs;
    checked before the Pallas im2col route, same param tree, same
    bias-absorbed-by-IN semantics, differentiable (custom VJP).

    ``conv25d=True`` routes big-volume C<=64 3x3x3/1x3x3 stages through the
    2.5D decomposition (ops/conv25d): D folded into the conv2d batch, kd
    taps as output-channel groups, strided shift-add reduce.  No packing,
    no layout change, plain lax (autodiff backward).  Same param tree and
    bias-absorbed-by-IN semantics as the other fused routes; checked before
    blocked/pallas so the large-spatial stages take it when enabled."""
    features: int
    kernel: Sequence[int]
    stride: Sequence[int]
    dtype: jnp.dtype = jnp.float32
    negative_slope: float = 0.01
    pallas_conv: bool = False
    int8_min_ch: int = 0
    blocked_conv: bool = False
    conv25d: bool = False

    @nn.compact
    def __call__(self, x, skip=None):
        # concat-free skip fusion (round 5): the decoder's channel concat
        # materializes ~0.5-1 GB per stage from 64-128-byte interleaved
        # runs; when the 2.5D route is eligible for the combined width,
        # split the kernel instead (convolution is linear in channels) —
        # exact vs conv(concat(...)).  Other routes concat locally
        # (unchanged behavior).
        if skip is not None:
            import os
            cin_total = x.shape[-1] + skip.shape[-1]
            from ..ops.conv25d import eligible
            # OPT-IN (LNN_PAIR_FUSION=1): the split-weight form measured a
            # REGRESSION at CT scale on chip (forward 199.7 -> 320.3 ms,
            # results/r5/ab_fwd_concatfree.log) — XLA evidently schedules
            # the two partial convs worse than concat+conv.  Kept as a
            # correct, tested route pending a better schedule.
            if os.environ.get("LNN_PAIR_FUSION", "0") == "1" \
                    and self.conv25d and eligible(x.shape, tuple(self.kernel),
                                                  tuple(self.stride),
                                                  cin_total, self.features):
                from ..ops.conv25d import conv25d_in_lrelu_pair
                kshape = tuple(self.kernel) + (cin_total, self.features)
                w = _ConvParams(kshape, name="Conv_0")()
                scale, offset = _INParams(self.features,
                                          name="InstanceNorm_0")()
                return conv25d_in_lrelu_pair(
                    x.astype(self.dtype), skip.astype(self.dtype), w,
                    scale, offset, self.negative_slope,
                    out_dtype=self.dtype, strides=tuple(self.stride))
            x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
        if self._use_int8(x):
            kshape = tuple(self.kernel) + (x.shape[-1], self.features)
            w = _ConvParams(kshape, name="Conv_0")()
            y = _int8_conv(x, w, self.stride)
            y = InstanceNorm(dtype=self.dtype, name="InstanceNorm_0")(y)
            return nn.leaky_relu(y, self.negative_slope)
        if self._use_conv25d(x):
            from ..ops.conv25d import conv25d_in_lrelu
            kshape = tuple(self.kernel) + (x.shape[-1], self.features)
            w = _ConvParams(kshape, name="Conv_0")()
            scale, offset = _INParams(self.features, name="InstanceNorm_0")()
            return conv25d_in_lrelu(x, w, scale, offset, self.negative_slope,
                                    out_dtype=self.dtype,
                                    strides=tuple(self.stride))
        bs = self._packed_bs(x)
        if bs is not None:
            from ..ops.pallas.block_pack import packed_conv_in_lrelu
            kshape = tuple(self.kernel) + (x.shape[-1], self.features)
            w = _ConvParams(kshape, name="Conv_0")()
            scale, offset = _INParams(self.features, name="InstanceNorm_0")()
            return packed_conv_in_lrelu(x, w, scale, offset,
                                        self.negative_slope,
                                        out_dtype=self.dtype, bs=bs,
                                        strides=tuple(self.stride))
        if self._use_pallas(x):
            from ..ops.pallas.conv3d import conv3d_in_lrelu
            kshape = tuple(self.kernel) + (x.shape[-1], self.features)
            w = _ConvParams(kshape, name="Conv_0")()
            scale, offset = _INParams(self.features, name="InstanceNorm_0")()
            return conv3d_in_lrelu(x, w, scale, offset, self.negative_slope,
                                   out_dtype=self.dtype)
        x = nn.Conv(
            self.features, kernel_size=tuple(self.kernel),
            strides=tuple(self.stride), padding=_sym_pads(self.kernel),
            dtype=self.dtype, param_dtype=jnp.float32,
            kernel_init=nn.initializers.he_normal(),
        )(x)
        x = InstanceNorm(dtype=self.dtype)(x)
        return nn.leaky_relu(x, self.negative_slope)

    def _use_int8(self, x) -> bool:
        return (self.int8_min_ch > 0
                and min(x.shape[-1], self.features) >= self.int8_min_ch
                and x.ndim == 5)

    def _use_conv25d(self, x) -> bool:
        if not self.conv25d:
            return False
        from ..ops.conv25d import eligible
        return eligible(x.shape, tuple(self.kernel), tuple(self.stride),
                        x.shape[-1], self.features)

    def _packed_bs(self, x):
        """Block size for the DMA-packed fast-regime route
        (ops/pallas/block_pack.packed_conv_in_lrelu), or None.

        Measured regime (results/r4/stage_scan_packed.log): the win lives
        at C<=64 big-volume 3x3x3 stages split into >=16 cubic 32/16
        blocks with uniform stride; everything else stays on the Pallas
        im2col kernel / XLA composition.  Differentiable (custom VJP), so
        training may route here too."""
        if not (self.blocked_conv and x.ndim == 5
                and tuple(self.kernel) == (3, 3, 3)
                and tuple(self.stride) in ((1, 1, 1), (2, 2, 2))
                and max(x.shape[-1], self.features) <= 64):
            return None
        import os
        if jax.devices()[0].platform != "tpu" \
                and os.environ.get("LNN_BLOCKED_FORCE", "0") != "1":
            return None                      # FORCE=1: CPU tests (interpret)
        from ..ops.pallas.block_pack import pick_bs
        # bs=8 blocks read ~3x extra bytes (halo+junk) — not worth it; the
        # small-patch families (hippocampus) stay on the Pallas im2col path.
        # channels: the fused-minor DMA needs 128-lane-aligned windows for
        # BOTH the pack (Cin) and the unpack (Cout) — this also excludes
        # the trivial Cin=1 first conv (negligible FLOPs).
        on_tpu = jax.devices()[0].platform == "tpu"
        return pick_bs(x.shape[1:4], prefer=(32, 16), batch=x.shape[0],
                       min_blocks=16,
                       channels=(x.shape[-1], self.features) if on_tpu
                       else None)

    def _use_pallas(self, x) -> bool:
        if not (self.pallas_conv and self.dtype == jnp.bfloat16
                and x.ndim == 5):
            return False
        if jax.devices()[0].platform != "tpu":
            return False
        # NOTE: only the lane-aligned direct path is routed here. The packed
        # path (ops/pallas/conv3d.pack_plan) was measured SLOWER than XLA on
        # every non-aligned nnU-Net shape: XLA's conv folds the batch dim
        # into the MXU, reaching 41.6 TFLOP/s at C=32 once batch >= ~64
        # (TTA-fused inference), so lane-packing windows has nothing to win
        # there — see RESULTS.md round 2 "lane-packing probe".
        from ..ops.pallas.conv3d import supported
        return supported(x.shape[:-1] + (max(x.shape[-1], self.features),),
                         self.kernel, self.stride) \
            and x.shape[-1] <= 64 and self.features <= 64


class ConvTranspose25D(nn.Module):
    """Drop-in for nn.ConvTranspose (k==s decoder upsample) with selectable
    lowering (LNN_UPT_MODE).  Round-5 chained measurements
    (results/r5/upt_probe2.log) showed the direct lax.conv_transpose is the
    FASTEST route at every decoder level — the r4 "0.9 T/s hog" reading was
    a dispatch-floor artifact — so "direct" is the default; the 2.5D
    slicewise / octant-matmul / Pallas-interleave alternatives remain
    selectable for A/Bs.  Param tree identical to nn.ConvTranspose
    (kernel/bias, f32) — all modes exact (k==s taps don't overlap),
    checkpoints flag-agnostic."""
    features: int
    strides: Sequence[int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        import os
        from jax import lax
        from ..ops.conv25d import (conv_transpose3d_matmul,
                                   conv_transpose3d_slicewise,
                                   upsample_eligible)
        kshape = tuple(self.strides) + (x.shape[-1], self.features)
        w = self.param("kernel", nn.initializers.he_normal(), kshape,
                       jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
        # mode: "matmul" = octant-pair matmuls w/ free W-merge (exact,
        # no conv lowering at all), "slicewise" = per-D-tap 2D transposed
        # convs.  Both exact vs nn.ConvTranspose (k==s taps don't overlap).
        # The shape gate lives HERE (call time) so callers can use this
        # module unconditionally: small deep-decoder levels fall through
        # to the direct lax path, which measured fine at 32^3-and-below.
        # DEFAULT = "direct" (round-5 chained measurements,
        # results/r5/upt_probe2.log): with the relay's ~25-35 ms
        # per-dispatch floor subtracted, lax.conv_transpose is the FASTEST
        # route at every decoder level (7.8 ms / 4.4 T/s at b4 64^3
        # C64->32 vs 9.7 slicewise / 11.9 matmul+stack / 14.1 pallas) —
        # the r4 "0.9 T/s ConvTranspose hog" was a one-shot-measurement
        # artifact.  The bare octant matmuls alone cost 5.6 ms (skinny
        # K=64), so no matmul-based route can meaningfully beat direct.
        mode = os.environ.get("LNN_UPT_MODE", "direct")
        xd = x.astype(self.dtype)
        strides = tuple(self.strides)
        if mode != "direct" and x.ndim == 5 \
                and upsample_eligible(x.shape, strides, strides):
            kshape_full = strides + (x.shape[-1], self.features)
            if mode == "pallas" and strides == (2, 2, 2):
                from ..ops.pallas.interleave import (
                    conv_transpose3d_matmul_pallas)
                from ..ops.pallas.interleave import supported as _ilv_ok
                if _ilv_ok(x.shape, kshape_full, xd.dtype):
                    y = conv_transpose3d_matmul_pallas(xd, w)
                else:
                    y = conv_transpose3d_matmul(xd, w, strides)
            elif mode in ("matmul", "pallas") and strides == (2, 2, 2):
                y = conv_transpose3d_matmul(xd, w, strides)
            else:
                y = conv_transpose3d_slicewise(xd, w, strides)
        else:
            dn = (("NDHWC", "DHWIO", "NDHWC") if x.ndim == 5
                  else ("NHWC", "HWIO", "NHWC"))
            y = lax.conv_transpose(xd, w.astype(self.dtype), strides,
                                   "VALID", dimension_numbers=dn)
        return y + b.astype(y.dtype)


class ConvStage(nn.Module):
    """Two ConvNormAct blocks; the first may be strided (downsampling)."""
    features: int
    kernel: Sequence[int]
    first_stride: Sequence[int]
    dtype: jnp.dtype = jnp.float32
    pallas_conv: bool = False
    int8_min_ch: int = 0
    blocked_conv: bool = False
    conv25d: bool = False

    @nn.compact
    def __call__(self, x, skip=None):
        ones = (1,) * len(self.kernel)
        x = ConvNormAct(self.features, self.kernel, self.first_stride, self.dtype,
                        pallas_conv=self.pallas_conv,
                        int8_min_ch=self.int8_min_ch,
                        blocked_conv=self.blocked_conv,
                        conv25d=self.conv25d, name="block0")(x, skip)
        x = ConvNormAct(self.features, self.kernel, ones, self.dtype,
                        pallas_conv=self.pallas_conv,
                        int8_min_ch=self.int8_min_ch,
                        blocked_conv=self.blocked_conv,
                        conv25d=self.conv25d, name="block1")(x)
        return x


class GenericUNet(nn.Module):
    """Plans-driven U-Net. Top-level module names follow topological
    (encoder→bottleneck→decoder→seg heads) order so multi-head splitting can
    cut at any named point (models/multihead.py)."""
    num_classes: int                 # INCLUDING background
    pool_op_kernel_sizes: tuple      # ((2,2,2), ...) per downsampling
    conv_kernel_sizes: tuple         # per stage, len = num_pool + 1
    base_num_features: int = 32
    max_num_features: int = 320
    dtype: jnp.dtype = jnp.float32
    deep_supervision: bool = True
    # rematerialize each conv stage in the backward pass: trades ~30% extra
    # FLOPs for O(stages) less activation HBM — enables large CT patches
    # (e.g. 128^3) on 16 GB chips
    remat: bool = False
    # route eligible low-channel stages through the fused Pallas conv+IN+
    # LReLU kernel (inference-only; see ConvNormAct) — enable on a restored
    # model via model.clone(pallas_conv=True)
    pallas_conv: bool = False
    # inference-only: run stages with min(Cin,Cout) >= this through int8
    # dynamic quantization (0 = off); opt in via LNN_INT8_CONV=<N>
    int8_min_ch: int = 0
    # route big-volume 3x3x3 stages through the DMA-packed fast-regime conv
    # (ops/pallas/block_pack.packed_conv_in_lrelu) — differentiable, exact,
    # param-tree-identical; see ConvNormAct._packed_bs.  Opt in via
    # LNN_BLOCKED_CONV=1 until chip-measured.
    blocked_conv: bool = False
    # 2.5D decomposition for big-volume C<=64 stages (ops/conv25d): free
    # D-into-batch fold + kd-tap shift-add; plain lax, differentiable.
    # Gate: LNN_CONV25D (see maybe_pallas_conv / TrainerOptions).
    conv25d: bool = False

    @property
    def num_pool(self):
        return len(self.pool_op_kernel_sizes)

    def stage_features(self, stage: int) -> int:
        return int(min(self.base_num_features * (2 ** stage), self.max_num_features))

    def module_order(self) -> list:
        """Topological order of top-level submodules (the 'registration
        order' the reference's shim establishes for dot-path splits)."""
        order = [f"enc{s}" for s in range(self.num_pool)]
        order.append("bottleneck")
        for d in range(self.num_pool):
            order += [f"up{d}", f"dec{d}"]
        order += [f"seg{d}" for d in range(self.num_pool)]
        return order

    @nn.compact
    def __call__(self, x, capture_taps: bool = False):
        """x: [B, *spatial, C_in].  Returns list of deep-supervision logits,
        highest resolution first (upstream convention), each
        [B, *spatial_i, num_classes].  With ``capture_taps`` also returns a
        dict of intermediate activations (for POD/PLOP distillation)."""
        dim = x.ndim - 2
        assert len(self.conv_kernel_sizes[0]) == dim, (
            f"model is {len(self.conv_kernel_sizes[0])}D, input is {dim}D")
        stage_cls = nn.remat(ConvStage) if self.remat else ConvStage
        taps = {}
        skips = []
        h = x.astype(self.dtype)
        # encoder
        for s in range(self.num_pool):
            stride = (1,) * dim if s == 0 else tuple(self.pool_op_kernel_sizes[s - 1])
            h = stage_cls(self.stage_features(s), self.conv_kernel_sizes[s], stride,
                          self.dtype, pallas_conv=self.pallas_conv,
                          int8_min_ch=self.int8_min_ch,
                          blocked_conv=self.blocked_conv,
                          conv25d=self.conv25d, name=f"enc{s}")(h)
            taps[f"enc{s}"] = h
            skips.append(h)
        # bottleneck
        h = stage_cls(self.stage_features(self.num_pool),
                      self.conv_kernel_sizes[self.num_pool],
                      tuple(self.pool_op_kernel_sizes[-1]),
                      self.dtype, pallas_conv=self.pallas_conv,
                      int8_min_ch=self.int8_min_ch,
                      blocked_conv=self.blocked_conv,
                      conv25d=self.conv25d, name="bottleneck")(h)
        taps["bottleneck"] = h
        # decoder + seg heads
        seg_outputs = []
        for d in range(self.num_pool):
            skip = skips[self.num_pool - 1 - d]
            up_stride = tuple(self.pool_op_kernel_sizes[self.num_pool - 1 - d])
            feats = skip.shape[-1]
            if self.conv25d and h.ndim == 5:
                # shape gate (upsample_eligible) is inside the module
                h = ConvTranspose25D(feats, up_stride, dtype=self.dtype,
                                     name=f"up{d}")(h)
            else:
                h = nn.ConvTranspose(
                    feats, kernel_size=up_stride, strides=up_stride,
                    padding="VALID", dtype=self.dtype, param_dtype=jnp.float32,
                    kernel_init=nn.initializers.he_normal(), name=f"up{d}",
                )(h)
            # skip fusion handled inside ConvStage/ConvNormAct: concat-free
            # split-weight convs where the 2.5D route is eligible, local
            # concat otherwise — identical math and parameter tree
            h = stage_cls(feats, self.conv_kernel_sizes[self.num_pool - 1 - d],
                          (1,) * dim, self.dtype,
                          pallas_conv=self.pallas_conv,
                          blocked_conv=self.blocked_conv,
                          conv25d=self.conv25d,
                          name=f"dec{d}")(h, skip.astype(self.dtype))
            taps[f"dec{d}"] = h
            logits = nn.Conv(self.num_classes, kernel_size=(1,) * dim,
                             dtype=self.dtype, param_dtype=jnp.float32,
                             kernel_init=nn.initializers.he_normal(),
                             name=f"seg{d}")(h)
            seg_outputs.append(logits.astype(jnp.float32))
        # highest resolution first
        outputs = seg_outputs[::-1] if self.deep_supervision else [seg_outputs[-1]]
        if capture_taps:
            return outputs, taps
        return outputs


def maybe_pallas_conv(model):
    """Clone with the fused Pallas conv path enabled — the DEFAULT for
    inference call sites (run_inference, evaluator2, bench); disable with
    LNN_PALLAS_CONV=0.

    Safe as a default: the routing (ConvNormAct._use_pallas) only fires on
    TPU for bf16 3x3x3/stride-1 stages with lane-aligned widths and falls
    back to the XLA composition everywhere else, and the kernel is measured
    1.43x on the CT sliding-window workload (RESULTS.md).  Training enables
    the same path via ``--pallas_conv`` (the kernel is differentiable —
    custom VJP, see ops/pallas/conv3d).  Checkpoints are flag-agnostic
    (identical param tree)."""
    import os
    if os.environ.get("LNN_PALLAS_CONV", "1") != "0" and hasattr(model, "pallas_conv"):
        model = model.clone(pallas_conv=True)
    # experimental mixed-precision inference: LNN_INT8_CONV=<N> quantizes
    # stages with min(Cin,Cout) >= N (probe flag, VERDICT r2 #4; off by
    # default — quantization slightly perturbs logits)
    int8_min = int(os.environ.get("LNN_INT8_CONV", "0") or 0)
    if int8_min > 0 and hasattr(model, "int8_min_ch"):
        model = model.clone(int8_min_ch=int8_min)
    # W-whole blocked-stage route (ops/blocked_conv): big-volume 3x3x3
    # stages as VALID convs over anisotropic blocks.  LNN_BLOCKED_CONV=1
    # opts in (off by default until chip-measured e2e).
    if os.environ.get("LNN_BLOCKED_CONV", "0") == "1" \
            and hasattr(model, "blocked_conv"):
        model = model.clone(blocked_conv=True)
    # 2.5D conv decomposition for the big-volume stages (ops/conv25d) —
    # LNN_CONV25D=0 opts out; default-on pending the chip measurement in
    # results/r4/stage_scan_conv25d.log (the route only fires on stride-1
    # C<=64 convs with >=256k voxels/item and N*D>=64 — see
    # ops/conv25d.eligible — so small-patch families like hippocampus
    # 56x40x40 are unaffected).
    if os.environ.get("LNN_CONV25D", "1") != "0" \
            and hasattr(model, "conv25d"):
        model = model.clone(conv25d=True)
    return model


def unet_from_plans(plans, config_name: str, dtype=jnp.float32,
                    deep_supervision: bool = True) -> GenericUNet:
    cfg = plans.config(config_name)
    return GenericUNet(
        num_classes=plans.num_classes + 1,
        pool_op_kernel_sizes=tuple(tuple(k) for k in cfg.pool_op_kernel_sizes),
        conv_kernel_sizes=tuple(tuple(k) for k in cfg.conv_kernel_sizes),
        base_num_features=cfg.base_num_features,
        max_num_features=cfg.max_num_features,
        dtype=dtype,
        deep_supervision=deep_supervision,
    )


def ds_scale_factors(pool_op_kernel_sizes) -> list:
    """Cumulative downsampling factor of each deep-supervision output,
    highest resolution first: [1,1,1], pool[0], pool[0]*pool[1], ..."""
    dim = len(pool_op_kernel_sizes[0])
    factors = [np.ones(dim, dtype=np.int64)]
    acc = np.ones(dim, dtype=np.int64)
    for k in pool_op_kernel_sizes[:-1]:
        acc = acc * np.array(k)
        factors.append(acc.copy())
    return [tuple(int(x) for x in f) for f in factors]
