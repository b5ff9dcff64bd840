"""2x up-interleave as a Pallas DMA kernel — the decoder-upsample fix.

The k=s=2 ConvTranspose decomposes exactly into 4 octant-pair matmuls with
a FREE W-interleave (channel order (k, c) — ops/conv25d.
conv_transpose3d_matmul), leaving only the H- and D-interleaves.  Every XLA
formulation of those interleaves measured at the relayout wall (~0.7-1.1
T/s end-to-end, results/r5/isoscan_upt_strided.log, r4 stage_scan_upT*):
XLA materializes the stack/reshape through strided copies far below HBM
speed.  This kernel does the interleave as straight-line DMAs instead:

  * inputs: the 4 matmul outputs a_ij viewed as (ND, H, M) with the whole
    (2W, Co) row merged into M (a free view; M is lane-aligned)
  * output: (ND, 2, 2H, M) — row (nd, i, 2h+j) := a_ij[nd, h] — which
    reshapes FREELY to (N, 2D, 2H, 2W, Co)
  * grid (ND, H/Hb): each cell writes one contiguous (2, 2Hb, M) output
    block from 4 contiguous (Hb, M) input blocks; with Hb=8 at CT scale
    every DMA is >=64 KB — pure bandwidth, no strided access anywhere.

The backward pass is the de-interleave (gradient of a gather is the
inverse gather) — implemented as the mirror kernel and wired via
``jax.custom_vjp`` so the decoder trains through this path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _pick_hb(H: int) -> int:
    for hb in (8, 4, 2, 1):
        if H % hb == 0:
            return hb
    return 1


def _ileave_kernel(a00, a01, a10, a11, out):
    # out[0, i, 2h+j] = a_ij[0, h]
    for i, (aj0, aj1) in enumerate(((a00, a01), (a10, a11))):
        blk = jnp.stack([aj0[0], aj1[0]], axis=1)       # (Hb, 2, M)
        out[0, i] = blk.reshape(-1, blk.shape[-1])      # (2Hb, M)


def _dileave_kernel(g, g00, g01, g10, g11):
    # inverse: g_ij[0, h] = g[0, i, 2h+j]
    for i, refs in enumerate(((g00, g01), (g10, g11))):
        blk = g[0, i].reshape(-1, 2, g.shape[-1])       # (Hb, 2, M)
        refs[0][0] = blk[:, 0]
        refs[1][0] = blk[:, 1]


def _ileave_call(a00, a01, a10, a11, *, interpret=False):
    ND, H, M = a00.shape
    hb = _pick_hb(H)
    return pl.pallas_call(
        _ileave_kernel,
        grid=(ND, H // hb),
        in_specs=[pl.BlockSpec((1, hb, M), lambda nd, h: (nd, h, 0))] * 4,
        out_specs=pl.BlockSpec((1, 2, 2 * hb, M), lambda nd, h: (nd, 0, h, 0)),
        out_shape=jax.ShapeDtypeStruct((ND, 2, 2 * H, M), a00.dtype),
        interpret=interpret,
    )(a00, a01, a10, a11)


def _dileave_call(g, *, interpret=False):
    ND, _, H2, M = g.shape
    H = H2 // 2
    hb = _pick_hb(H)
    shape = jax.ShapeDtypeStruct((ND, H, M), g.dtype)
    return pl.pallas_call(
        _dileave_kernel,
        grid=(ND, H // hb),
        in_specs=[pl.BlockSpec((1, 2, 2 * hb, M), lambda nd, h: (nd, 0, h, 0))],
        out_specs=[pl.BlockSpec((1, hb, M), lambda nd, h: (nd, h, 0))] * 4,
        out_shape=[shape] * 4,
        interpret=interpret,
    )(g)


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def interleave_up2(a00, a01, a10, a11, interpret=False):
    """out[nd, i, 2h+j, :] = a_ij[nd, h, :]; shapes (ND, H, M) -> (ND, 2,
    2H, M)."""
    return _ileave_call(a00, a01, a10, a11, interpret=interpret)


def _ileave_fwd(a00, a01, a10, a11, interpret):
    return _ileave_call(a00, a01, a10, a11, interpret=interpret), None


def _ileave_bwd(interpret, _res, g):
    return tuple(_dileave_call(g, interpret=interpret))


interleave_up2.defvjp(_ileave_fwd, _ileave_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def deinterleave2(x, interpret=False):
    """Inverse of interleave_up2: x (ND, 2, 2H, M) -> 4 arrays (ND, H, M)
    with a_ij[nd, h] = x[nd, i, 2h+j].  Contiguous-DMA phase split — the
    building block of the phase-split strided conv (ops/conv25d): XLA
    materializes the same split through the relayout wall (20.8 ms at CT
    s0 scale, results/r5/upt_probe3.log phase-slice-only).  Backward is
    the interleave kernel."""
    return tuple(_dileave_call(x, interpret=interpret))


def _dei_fwd(x, interpret):
    return tuple(_dileave_call(x, interpret=interpret)), None


def _dei_bwd(interpret, _res, g):
    return (_ileave_call(*g, interpret=interpret),)


deinterleave2.defvjp(_dei_fwd, _dei_bwd)


def phase_split_dh(x: jax.Array, interpret: bool = False):
    """Split a 5D volume into its 4 (D-parity, H-parity) phase fields:
    a_ij[n, bd, bh, w, c] = x[n, 2bd+i, 2bh+j, w, c].  D and H even;
    W*C must be lane-aligned (%128).  Pure contiguous DMAs; W parity is a
    later FREE (W/2, 2C) channel view.  Differentiable (backward =
    interleave)."""
    N, D, H, W, C = x.shape
    assert D % 2 == 0 and H % 2 == 0, (D, H)
    M = W * C
    xv = x.reshape(N * (D // 2), 2, H, M)
    parts = deinterleave2(xv, interpret)
    return tuple(p.reshape(N, D // 2, H // 2, W, C) for p in parts)


def phase_split_ok(x_shape, dtype) -> bool:
    if len(x_shape) != 5:
        return False
    N, D, H, W, C = x_shape
    return (D % 2 == 0 and H % 2 == 0 and W % 2 == 0
            and (W * C) % 128 == 0
            and dtype in (jnp.bfloat16, jnp.float32))


def shape_ok(x_shape, w_shape, dtype) -> bool:
    """Backend-independent part of the gate: 5D k=s=2 with a lane-aligned
    merged row."""
    if len(x_shape) != 5 or len(w_shape) != 5:
        return False
    N, D, H, W, Ci = x_shape
    kd, kh, kw, ci, Co = w_shape
    if (kd, kh, kw) != (2, 2, 2) or ci != Ci:
        return False
    M = 2 * W * Co
    return M % 128 == 0 and H >= 1 and dtype in (jnp.bfloat16, jnp.float32)


def supported(x_shape, w_shape, dtype) -> bool:
    """Routing gate: TPU backend + shape_ok."""
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    return shape_ok(x_shape, w_shape, dtype)


def conv_transpose3d_matmul_pallas(x: jax.Array, w: jax.Array,
                                   interpret: bool = False) -> jax.Array:
    """k=s=2 ConvTranspose = 4 octant-pair matmuls (free W-merge) + the
    Pallas interleave.  Exact vs lax.conv_transpose (taps don't overlap);
    differentiable (matmul adjoints + the de-interleave kernel)."""
    N, D, H, W, Ci = x.shape
    _, _, _, _, Co = w.shape
    w = w.astype(x.dtype)
    x2 = x.reshape(N * D, H, W, Ci)
    M = 2 * W * Co
    ys = []
    for i in range(2):
        for j in range(2):
            # lax.conv_transpose flips all spatial taps (delta probe, r5):
            # out[2d+i, 2h+j, 2w+k] = x @ w[1-i, 1-j, 1-k]; reverse k so
            # the merged channel order stays (k, c) — the free W-merge
            wij = w[1 - i, 1 - j, ::-1].transpose(1, 0, 2).reshape(
                Ci, 2 * Co)
            ys.append((x2 @ wij).reshape(N * D, H, M))
    z = interleave_up2(ys[0], ys[1], ys[2], ys[3], interpret)
    return z.reshape(N, 2 * D, 2 * H, 2 * W, Co)
