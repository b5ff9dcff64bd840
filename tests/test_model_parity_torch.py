"""Full-network forward parity: JAX GenericUNet vs a torch composition of
the reference's building blocks.

The reference's Generic_UNet (``nnunet_ext/network_architecture/
generic_UNet.py:12-51``, topology inherited from upstream nnU-Net) is built
from stock torch layers: Conv{2,3}d(padding=k//2) + InstanceNorm(affine) +
LeakyReLU(1e-2) blocks, strided first-conv downsampling
(convolutional_pooling), ConvTranspose(kernel=stride=pool) upsampling, skip
concat, 1x1 seg heads with deep supervision.  Upstream itself is not
importable here (no ``nnunet`` package), but every one of those layers IS —
so this suite mirrors the exact topology with torch primitives, loads the
IDENTICAL weights from the flax param tree, and asserts the full forward
(every deep-supervision output) matches to float32 tolerance.

This is the strongest architecture-parity evidence executable in this
environment: it validates conv arithmetic + the symmetric k//2 padding
contract (including the strided-downsampling grid alignment), InstanceNorm
statistics, transpose-conv semantics (incl. the flax->torch kernel flip),
skip ordering, feature widths, and deep-supervision head placement against
an independent framework.
"""
from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
from torch import nn as tnn  # noqa: E402

from lifelong_nnunet_tpu.models.unet import GenericUNet  # noqa: E402


def _t(x: np.ndarray) -> "torch.Tensor":
    # MUST copy: on CPU ``np.asarray(jax_array)`` can be a zero-copy view of
    # the live jax buffer, and ``torch.from_numpy`` shares memory — a torch
    # optimizer step would then silently corrupt the jax params (bit us in
    # test_trainer_trajectory_torch round 5).
    return torch.from_numpy(np.array(x, copy=True))


def _conv_nd(dim):
    return {2: tnn.Conv2d, 3: tnn.Conv3d}[dim]


def _convt_nd(dim):
    return {2: tnn.ConvTranspose2d, 3: tnn.ConvTranspose3d}[dim]


def _in_nd(dim):
    return {2: tnn.InstanceNorm2d, 3: tnn.InstanceNorm3d}[dim]


def _load_block(block_params, cin, cout, kernel, stride, dim):
    """One ConvNormAct: torch Conv(padding=k//2) + InstanceNorm(affine) +
    LeakyReLU(0.01), weights copied from the flax scope."""
    conv = _conv_nd(dim)(cin, cout, tuple(kernel), stride=tuple(stride),
                         padding=tuple(k // 2 for k in kernel))
    k = np.asarray(block_params["Conv_0"]["kernel"])  # [*k, cin, cout]
    perm = (dim + 1, dim) + tuple(range(dim))
    conv.weight.data = _t(k.transpose(perm))
    conv.bias.data = _t(np.asarray(block_params["Conv_0"]["bias"]))
    norm = _in_nd(dim)(cout, eps=1e-5, affine=True)
    norm.weight.data = _t(np.asarray(block_params["InstanceNorm_0"]["scale"]))
    norm.bias.data = _t(np.asarray(block_params["InstanceNorm_0"]["bias"]))
    return tnn.Sequential(conv, norm, tnn.LeakyReLU(0.01))


def _load_stage(stage_params, cin, cout, kernel, first_stride, dim):
    return tnn.Sequential(
        _load_block(stage_params["block0"], cin, cout, kernel, first_stride,
                    dim),
        _load_block(stage_params["block1"], cout, cout, kernel,
                    (1,) * dim, dim))


class TorchGenericUNet(tnn.Module):
    """The reference topology (encoder / bottleneck / transpose-conv decoder
    with skip concat / per-stage 1x1 seg heads), loaded from a flax
    GenericUNet param tree."""

    def __init__(self, model: GenericUNet, params, in_channels: int):
        super().__init__()
        dim = len(model.conv_kernel_sizes[0])
        self.dim = dim
        p = jax.tree_util.tree_map(np.asarray, params)
        np_ = model.num_pool
        feats = [model.stage_features(s) for s in range(np_ + 1)]

        self.enc = tnn.ModuleList()
        cin = in_channels
        for s in range(np_):
            stride = (1,) * dim if s == 0 \
                else tuple(model.pool_op_kernel_sizes[s - 1])
            self.enc.append(_load_stage(p[f"enc{s}"], cin, feats[s],
                                        model.conv_kernel_sizes[s], stride,
                                        dim))
            cin = feats[s]
        self.bottleneck = _load_stage(
            p["bottleneck"], cin, feats[np_], model.conv_kernel_sizes[np_],
            tuple(model.pool_op_kernel_sizes[-1]), dim)

        self.ups = tnn.ModuleList()
        self.dec = tnn.ModuleList()
        self.seg = tnn.ModuleList()
        cin = feats[np_]
        for d in range(np_):
            skip_f = feats[np_ - 1 - d]
            up_stride = tuple(model.pool_op_kernel_sizes[np_ - 1 - d])
            up = _convt_nd(dim)(cin, skip_f, up_stride, stride=up_stride,
                                bias=True)
            k = np.asarray(p[f"up{d}"]["kernel"])      # [*k, cin, cout]
            # flax ConvTranspose (lax.conv_transpose, transpose_kernel=False)
            # applies the kernel in cross-correlation orientation on the
            # dilated input; torch's ConvTranspose is the conv GRADIENT, i.e.
            # the spatially flipped kernel — flip to map between them.
            k = np.flip(k, axis=tuple(range(dim)))
            perm = (dim, dim + 1) + tuple(range(dim))  # [cin, cout, *k]
            up.weight.data = _t(k.transpose(perm))
            up.bias.data = _t(np.asarray(p[f"up{d}"]["bias"]))
            self.ups.append(up)
            self.dec.append(_load_stage(
                p[f"dec{d}"], 2 * skip_f, skip_f,
                model.conv_kernel_sizes[np_ - 1 - d], (1,) * dim, dim))
            seg = _conv_nd(dim)(skip_f, model.num_classes, 1)
            ks = np.asarray(p[f"seg{d}"]["kernel"])
            seg.weight.data = _t(ks.transpose(
                (dim + 1, dim) + tuple(range(dim))))
            seg.bias.data = _t(np.asarray(p[f"seg{d}"]["bias"]))
            self.seg.append(seg)
            cin = skip_f

    def forward(self, x):
        skips = []
        h = x
        for enc in self.enc:
            h = enc(h)
            skips.append(h)
        h = self.bottleneck(h)
        outs = []
        for d, (up, dec, seg) in enumerate(zip(self.ups, self.dec, self.seg)):
            h = up(h)
            h = torch.cat([h, skips[len(skips) - 1 - d]], dim=1)
            h = dec(h)
            outs.append(seg(h))
        return outs[::-1]  # highest resolution first, upstream convention


CONFIGS = [
    # (name, pools, kernels, in_ch, spatial)
    ("3d_iso", ((2, 2, 2), (2, 2, 2)), ((3, 3, 3),) * 3, 1, (16, 16, 16)),
    # anisotropic plans shape (low-res axis pools late) — exercises per-axis
    # strides, per-axis k//2 padding, and anisotropic transpose convs
    ("3d_aniso", ((1, 2, 2), (2, 2, 2)), ((1, 3, 3), (3, 3, 3), (3, 3, 3)),
     2, (8, 16, 16)),
    ("2d", ((2, 2), (2, 2)), ((3, 3),) * 3, 1, (24, 24)),
]


@pytest.mark.parametrize("name,pools,kernels,in_ch,spatial",
                         CONFIGS, ids=[c[0] for c in CONFIGS])
def test_full_forward_matches_torch(name, pools, kernels, in_ch, spatial):
    model = GenericUNet(num_classes=3, pool_op_kernel_sizes=pools,
                        conv_kernel_sizes=kernels, base_num_features=4,
                        max_num_features=16, dtype=jnp.float32)
    rng = np.random.RandomState(0)
    x = rng.normal(size=(2,) + spatial + (in_ch,)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    jax_outs = model.apply({"params": params}, jnp.asarray(x))

    tmodel = TorchGenericUNet(model, params, in_ch)
    tmodel.eval()
    dim = len(spatial)
    xt = _t(x.transpose((0, dim + 1) + tuple(range(1, dim + 1))))
    with torch.no_grad():
        torch_outs = tmodel(xt)

    assert len(jax_outs) == len(torch_outs) == len(pools)
    for i, (jo, to) in enumerate(zip(jax_outs, torch_outs)):
        to_cl = to.numpy().transpose((0,) + tuple(range(2, dim + 2)) + (1,))
        assert jo.shape == to_cl.shape, (i, jo.shape, to_cl.shape)
        np.testing.assert_allclose(np.asarray(jo), to_cl, atol=2e-4,
                                   rtol=1e-3, err_msg=f"DS output {i}")


def test_strided_conv_grid_matches_torch():
    """The downsampling alignment itself (symmetric k//2 padding at stride 2
    must equal torch's padding=1 — XLA's "SAME" would be off by one)."""
    from lifelong_nnunet_tpu.models.unet import ConvNormAct
    m = ConvNormAct(features=4, kernel=(3, 3, 3), stride=(2, 2, 2),
                    dtype=jnp.float32)
    rng = np.random.RandomState(1)
    x = rng.normal(size=(1, 8, 8, 8, 2)).astype(np.float32)
    params = m.init(jax.random.PRNGKey(1), jnp.asarray(x))["params"]
    y = np.asarray(m.apply({"params": params}, jnp.asarray(x)))

    tb = _load_block(jax.tree_util.tree_map(np.asarray, params), 2, 4,
                     (3, 3, 3), (2, 2, 2), 3)
    with torch.no_grad():
        yt = tb(_t(x.transpose(0, 4, 1, 2, 3))).numpy()
    np.testing.assert_allclose(y, yt.transpose(0, 2, 3, 4, 1), atol=2e-4,
                               rtol=1e-3)
