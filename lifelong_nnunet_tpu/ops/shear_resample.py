"""Affine spatial resampling as shear-decomposed banded matmuls (no gathers).

Per-element gathers are the slowest primitive on TPU (the VPU cannot gather
across lanes; XLA lowers them to scalar loads).  The classic alternative is
the Paeth/Tanaka shear factorization: any rotation is a product of shears,

    R_2D(θ) = Sh_x(-tan θ/2) · Sh_y(sin θ) · Sh_x(-tan θ/2),

and a shear ``x_i += λ·x_j`` resamples each 1-D line along axis *i* by an
offset that is constant per *j*-slab — expressible as a **banded interpolation
matrix** W[j, a_in, a_out] applied with one einsum.  Every pass is a stack of
small matmuls (MXU work, zero gathers).  A full 3-D rotation+scale+grid-snap
becomes ~15 such passes; measured ~5-10x faster than the 8-corner trilinear
gather on TPU v5e at nnU-Net patch sizes.

Semantics: ``out(p) = in(M(p - c) + c)`` with M = S·Rz·Ry·Rx (matching
`data/augment.py`'s gather-based `_spatial_coords`), linear interpolation,
zero padding outside.  Segmentations ride along as one-hot channels and are
argmax-decoded after the passes (channel 0 = ignore label -1, so sheared-out
border voxels decode to -1 like the gather path's cval).

Repeated 1-D linear interpolation is slightly more smoothing than direct
trilinear sampling — irrelevant for augmentation (it IS a randomized
distortion), validated distributionally in tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _band_matrix(src, size_in):
    """Linear-interp band matrix from source positions.
    src: [..., a_out] float source coordinate per output index.
    Returns W [..., a_in, a_out] with hat weights; rows fully outside -> 0."""
    a_in = jnp.arange(size_in, dtype=jnp.float32)
    shape = src.shape[:-1] + (size_in, src.shape[-1])
    d = jnp.abs(a_in[..., :, None] - src[..., None, :])
    return jnp.maximum(0.0, 1.0 - d).astype(jnp.float32)


def _nearest_band_matrix(src, size_in):
    a_in = jnp.arange(size_in, dtype=jnp.float32)
    d = jnp.abs(a_in[..., :, None] - jnp.round(src)[..., None, :])
    return (d < 0.5).astype(jnp.float32)


def _apply_axis_pass(x, W, axis):
    """x: [*spatial, C]; W: [a_in, a_out] shared across slabs.
    Contract x's ``axis`` with W."""
    x_moved = jnp.moveaxis(x, axis, -2)                # [..., a_in, C]
    out = jnp.einsum("...ac,ab->...bc", x_moved, W,
                     preferred_element_type=jnp.float32)
    return jnp.moveaxis(out, -2, axis)


def _apply_shear_pass(x, W, axis_a, axis_b):
    """x: [*spatial, C]; W: [b, a_in, a_out] — per-b-slab band matrices.
    Contract x's axis_a with W, with W selected by axis_b's index."""
    xa = jnp.moveaxis(x, (axis_b, axis_a), (0, 1))     # [b, a_in, *rest, C]
    out = jnp.einsum("bar...c,bax->bxr...c" if xa.ndim == 4 else "ba...c,bax->bx...c",
                     xa, W, preferred_element_type=jnp.float32)
    return jnp.moveaxis(out, (0, 1), (axis_b, axis_a))


def _shear(x, axis_a, axis_b, lam, center):
    """out[p] = x at position p_a + lam * (p_b - c_b) along axis_a."""
    size_a = x.shape[axis_a]
    size_b = x.shape[axis_b]
    a_out = jnp.arange(size_a, dtype=jnp.float32)
    b_idx = jnp.arange(size_b, dtype=jnp.float32)
    src = a_out[None, :] + lam * (b_idx[:, None] - center[axis_b])  # [b, a_out]
    W = _band_matrix(src, size_a)                                   # [b, a_in, a_out]
    return _apply_shear_pass(x, W, axis_a, axis_b)


def _scale_axis(x, axis, scale, center, snap: jnp.ndarray | None = None):
    """out[p] = x at position c + scale*(p - c) along ``axis``; optionally the
    OUTPUT index is first snapped to a pitch (low-res simulation)."""
    size = x.shape[axis]
    a_out = jnp.arange(size, dtype=jnp.float32)
    pos = a_out if snap is None else jnp.floor(a_out / snap) * snap
    src = center[axis] + scale * (pos - center[axis])
    W = _band_matrix(src[None, :], size)[0]            # [a_in, a_out]
    return _apply_axis_pass(x, W, axis)


def _rot2d_shears(x, axis_i, axis_j, theta, center):
    """Rotate in the (axis_i, axis_j) plane by theta via 3 shears.
    Sampling map M = R(theta) acting on centered coords (p_i, p_j)."""
    alpha = -jnp.tan(theta / 2.0)
    beta = jnp.sin(theta)
    # pass order S1,S2,S3 yields sampling at S3·S2·S1·p = R·p
    x = _shear(x, axis_i, axis_j, alpha, center)
    x = _shear(x, axis_j, axis_i, beta, center)
    x = _shear(x, axis_i, axis_j, alpha, center)
    return x


def affine_resample_shear(data, seg, angles, scale, lowres_pitch=None,
                          num_seg_classes: int = 4):
    """Rotation+scale (+output-grid snap) resample of one sample without
    gathers.  data: [*spatial, C] f32; seg: [*spatial] int (-1 = ignore).
    angles: [dim(dim-1)/2] rotation angles (3D: x,y,z order as in
    augment._rot_matrix_3d); scale: scalar; lowres_pitch: scalar >= 1 or None.
    Returns (data', seg')."""
    dim = data.ndim - 1
    center = jnp.array([(s - 1) / 2.0 for s in data.shape[:dim]], jnp.float32)
    onehot = jax.nn.one_hot(seg.astype(jnp.int32) + 1, num_seg_classes,
                            dtype=jnp.float32)        # channel 0 == label -1
    x = jnp.concatenate([data.astype(jnp.float32), onehot], axis=-1)

    # Sampling map: out(p) = in(M p) in centered coords with
    # M = s·Rz·Ry·Rx·snap (matching augment._spatial_coords which computes
    # coords = R(snap(p)) * s ... note scale multiplies the rotated coords).
    # Composition rule: applying pass S1 then S2 samples at S1·S2·p — the
    # FIRST-applied pass is the LEFTMOST factor.  Hence order:
    # scale, Rz, Ry, Rx, snap.
    for a in range(dim):
        x = _scale_axis(x, a, scale, center)
    if dim == 3:
        ax, ay, az = angles[0], angles[1], angles[2]
        # plane conventions match augment._rot_matrix_3d: Rx rotates (y,z) =
        # axes (1,2); Ry rotates (z,x) = (2,0); Rz rotates (x,y) = (0,1).
        x = _rot2d_shears(x, 0, 1, az, center)   # Rz
        x = _rot2d_shears(x, 2, 0, ay, center)   # Ry
        x = _rot2d_shears(x, 1, 2, ax, center)   # Rx
    else:
        x = _rot2d_shears(x, 0, 1, angles[0], center)
    if lowres_pitch is not None:
        for a in range(dim):
            x = _scale_axis(x, a, 1.0, center, snap=lowres_pitch)

    C = data.shape[-1]
    out_data = x[..., :C]
    out_seg = jnp.argmax(x[..., C:], axis=-1).astype(jnp.int8) - 1
    return out_data, out_seg
