"""Device-side data augmentation: a jitted replacement for batchgenerators'
``get_moreDA_augmentation`` (SURVEY.md §2.8).

The reference runs augmentation in CPU worker processes
(``MultiThreadedAugmenter``); on TPU the same transforms run as one fused XLA
program on-device, overlapping with the host sampler via prefetch.  Transform
set and default probabilities mirror nnU-Net's moreDA config:

  * spatial: per-sample rotation (p=0.2, ±30°) + scaling (p=0.2, 0.7–1.4),
    trilinear resample for data / nearest for seg, constant padding
    (data 0 / seg -1)
  * mirroring along every axis (p=0.5 each)
  * Gaussian noise (p=0.1), Gaussian blur (p=0.2, σ∈[0.5,1.0])
  * multiplicative brightness (p=0.15, 0.75–1.25), contrast (p=0.15, 0.75–1.25)
  * simulated low resolution (p=0.25, zoom ∈[0.5,1]) — via coordinate snapping
  * gamma, inverted (p=0.1) and regular (p=0.3), range 0.7–1.5, retain stats

Everything is shape-static: the low-res simulation snaps sampling coordinates
instead of materializing a dynamically-shaped downsampled volume, and blur
uses a fixed 7-tap separable kernel whose σ is traced.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class AugmentConfig:
    do_rotation: bool = True
    p_rot: float = 0.2
    rot_max: float = np.deg2rad(30.0)
    do_scaling: bool = True
    p_scale: float = 0.2
    scale_range: tuple = (0.7, 1.4)
    do_mirror: bool = True
    mirror_axes: tuple = (0, 1, 2)
    # elastic deformation (batchgenerators surface; nnU-Net's moreDA config
    # disables it by default — upstream nnUNetTrainerV2 sets do_elastic=False)
    do_elastic: bool = False
    p_eldef: float = 0.2
    elastic_magnitude: tuple = (0.0, 6.0)   # voxels of max displacement
    elastic_grid: int = 4                   # coarse-noise downscale factor
    p_noise: float = 0.1
    p_blur: float = 0.2
    blur_sigma: tuple = (0.5, 1.0)
    p_brightness: float = 0.15
    p_contrast: float = 0.15
    p_lowres: float = 0.25
    p_gamma_inverted: float = 0.1
    p_gamma: float = 0.3
    gamma_range: tuple = (0.7, 1.5)
    # spatial resample backend: 'matmul' = shear-decomposed banded matmuls
    # (ops/shear_resample.py, no gathers — fast on TPU), 'gather' = direct
    # trilinear 8-corner gather, 'auto' = matmul on accelerators.
    spatial_mode: str = "auto"
    # anisotropic volumes: rotate only in-plane (about the leading/coarsest
    # axis) — nnU-Net's dummy-2D augmentation (plans.do_dummy_2d_aug)
    dummy_2d: bool = False


NO_AUGMENT = AugmentConfig(do_rotation=False, do_scaling=False, do_mirror=False,
                           p_noise=0.0, p_blur=0.0, p_brightness=0.0, p_contrast=0.0,
                           p_lowres=0.0, p_gamma_inverted=0.0, p_gamma=0.0)


def _rot_matrix_3d(angles):
    ax, ay, az = angles[0], angles[1], angles[2]
    cx, sx = jnp.cos(ax), jnp.sin(ax)
    cy, sy = jnp.cos(ay), jnp.sin(ay)
    cz, sz = jnp.cos(az), jnp.sin(az)
    rx = jnp.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    ry = jnp.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    rz = jnp.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return rz @ ry @ rx


def _rot_matrix_2d(angle):
    c, s = jnp.cos(angle), jnp.sin(angle)
    return jnp.array([[c, -s], [s, c]])


def _gather_nd(vol, idx, dim):
    """vol [*spatial, C], idx list of int arrays [*spatial] -> [*spatial, C]"""
    return vol[tuple(idx)] if dim == 3 else vol[tuple(idx)]


def sample_linear(vol, coords, cval=0.0):
    """Multilinear sampling. vol: [*spatial, C]; coords: [dim, *spatial]
    in voxel units.  Out-of-bounds -> cval."""
    dim = coords.shape[0]
    spatial = vol.shape[:dim]
    lo = jnp.floor(coords).astype(jnp.int32)
    frac = coords - lo
    out = 0.0
    inb = jnp.ones(coords.shape[1:], dtype=bool)
    for a in range(dim):
        inb &= (coords[a] >= 0) & (coords[a] <= spatial[a] - 1)
    for corner in range(2 ** dim):
        idx, w = [], 1.0
        for a in range(dim):
            bit = (corner >> a) & 1
            ia = jnp.clip(lo[a] + bit, 0, spatial[a] - 1)
            idx.append(ia)
            w = w * jnp.where(bit, frac[a], 1.0 - frac[a])
        out = out + w[..., None] * vol[tuple(idx)]
    return jnp.where(inb[..., None], out, cval)


def sample_nearest(vol, coords, cval=-1.0):
    dim = coords.shape[0]
    spatial = vol.shape[:dim]
    ri = jnp.round(coords).astype(jnp.int32)
    inb = jnp.ones(coords.shape[1:], dtype=bool)
    for a in range(dim):
        inb &= (ri[a] >= 0) & (ri[a] <= spatial[a] - 1)
    idx = tuple(jnp.clip(ri[a], 0, spatial[a] - 1) for a in range(dim))
    out = vol[idx]
    return jnp.where(inb[..., None] if out.ndim > len(spatial) else inb, out, cval)


def _base_grid(patch):
    dim = len(patch)
    axes = [jnp.arange(s, dtype=jnp.float32) for s in patch]
    mesh = jnp.meshgrid(*axes, indexing="ij")
    return jnp.stack(mesh)  # [dim, *patch]


def _spatial_coords(key, patch, cfg: AugmentConfig):
    """Random affine sampling grid for one sample; returns [dim, *patch]."""
    dim = len(patch)
    grid = _base_grid(patch)
    center = jnp.array([(s - 1) / 2.0 for s in patch]).reshape(dim, *([1] * dim))
    return _spatial_coords_from(key, grid - center, patch, cfg) + center


def _sample_affine_params(key, dim, cfg: AugmentConfig):
    """Draw (angles, scale) with the same distributions/gating as
    `_spatial_coords_from` (shared by the matmul path)."""
    k_rot, k_rotp, k_scale, k_scalep = jax.random.split(key, 4)
    n_ang = 3 if dim == 3 else 1
    angles = jax.random.uniform(k_rot, (n_ang,), minval=-cfg.rot_max, maxval=cfg.rot_max)
    if dim == 3 and cfg.dummy_2d:
        # in-plane rotation only: about the leading (through-plane) axis
        angles = angles * jnp.array([1.0, 0.0, 0.0])
    if cfg.do_rotation:
        do_r = jax.random.uniform(k_rotp) < cfg.p_rot
        angles = jnp.where(do_r, angles, jnp.zeros_like(angles))
    else:
        angles = jnp.zeros_like(angles)
    if cfg.do_scaling:
        sc = jax.random.uniform(k_scale, (), minval=cfg.scale_range[0],
                                maxval=cfg.scale_range[1])
        do_s = jax.random.uniform(k_scalep) < cfg.p_scale
        scale = jnp.where(do_s, sc, 1.0)
    else:
        scale = jnp.asarray(1.0)
    return angles, scale


def _spatial_coords_from(key, g, patch, cfg: AugmentConfig):
    """Apply random rotation/scaling to an already-centered coordinate grid
    ``g`` [dim, *patch]; returns the transformed centered grid.  Shares the
    parameter distributions with the matmul path (`_sample_affine_params`)."""
    dim = len(patch)
    angles, scale = _sample_affine_params(key, dim, cfg)
    rot = _rot_matrix_3d(angles) if dim == 3 else _rot_matrix_2d(angles[0])
    g = jnp.einsum("ij,j...->i...", rot, g)
    return g * scale


def _gauss_kernel7(sigma):
    x = jnp.arange(-3, 4, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / jnp.maximum(sigma, 1e-3)) ** 2)
    return k / k.sum()


def _blur(x, sigma, dim):
    """Separable 7-tap Gaussian blur via depthwise convs (one
    conv_general_dilated per axis — TPU-friendly, no strided reshapes);
    x [*spatial, C]."""
    k = _gauss_kernel7(sigma)
    C = x.shape[-1]
    xb = x[None]  # [1, *spatial, C]
    dn = jax.lax.conv_dimension_numbers(
        xb.shape, (1,) * dim + (1, 1),
        ("N" + "DHW"[-dim:] + "C", "DHW"[-dim:] + "IO", "N" + "DHW"[-dim:] + "C"))
    for a in range(dim):
        kshape = tuple(7 if i == a else 1 for i in range(dim))
        kern = k.reshape(kshape + (1, 1))
        kern = jnp.tile(kern, (1,) * dim + (1, C))  # depthwise: one filter per channel
        xb = jax.lax.conv_general_dilated(
            xb, kern, window_strides=(1,) * dim, padding="SAME",
            dimension_numbers=dn, feature_group_count=C)
    return xb[0]


def _augment_one(key, data, seg, cfg: AugmentConfig):
    """data [*patch, C] float32, seg [*patch] int8 -> same shapes."""
    dim = data.ndim - 1
    patch = data.shape[:dim]
    keys = jax.random.split(key, 18)

    # ---- spatial (rotation+scaling) + simulated low-res, ONE resample ----
    # Low-res simulation snaps the OUTPUT grid to a coarser pitch before the
    # affine map — equivalent to nearest-downsample + linear-upsample of the
    # transformed image, but composed into the same resample (saves a full
    # pass vs the reference's separate transform).
    if cfg.do_rotation or cfg.do_scaling or cfg.p_lowres > 0 or cfg.do_elastic:
        if cfg.p_lowres > 0:
            f = jax.random.uniform(keys[1], (), minval=1.0, maxval=2.0)  # zoom 0.5..1
            do_lr = jax.random.uniform(keys[2]) < cfg.p_lowres
            f = jnp.where(do_lr, f, 1.0)
        else:
            f = None
        use_matmul = cfg.spatial_mode == "matmul" or (
            cfg.spatial_mode == "auto" and jax.default_backend() != "cpu")
        if cfg.do_elastic:
            # elastic fields are not shear-decomposable -> gather path
            use_matmul = False
        if use_matmul:
            from ..ops.shear_resample import affine_resample_shear
            angles, scale = _sample_affine_params(keys[0], dim, cfg)
            data, seg = affine_resample_shear(data, seg, angles, scale,
                                              lowres_pitch=f)
        else:
            fv = 1.0 if f is None else f
            if cfg.do_rotation or cfg.do_scaling:
                base = _base_grid(patch)
                snapped = jnp.floor(base / fv) * fv
                center = jnp.array([(s - 1) / 2.0 for s in patch]).reshape(dim, *([1] * dim))
                coords = _spatial_coords_from(keys[0], snapped - center, patch, cfg) + center
            else:
                coords = jnp.floor(_base_grid(patch) / fv) * fv
            if cfg.do_elastic:
                k_e, k_ep = jax.random.split(jax.random.fold_in(keys[0], 7))
                mag = jax.random.uniform(k_e, (), minval=cfg.elastic_magnitude[0],
                                         maxval=cfg.elastic_magnitude[1])
                do_e = jax.random.uniform(k_ep) < cfg.p_eldef
                coarse = [max(2, s // cfg.elastic_grid) for s in patch]
                noise = jax.random.uniform(jax.random.fold_in(k_e, 1),
                                           (dim,) + tuple(coarse),
                                           minval=-1.0, maxval=1.0)
                disp = jax.image.resize(noise, (dim,) + tuple(patch), method="cubic")
                coords = coords + jnp.where(do_e, mag, 0.0) * disp
            data = sample_linear(data, coords, cval=0.0)
            seg = sample_nearest(seg.astype(jnp.float32), coords, cval=-1.0).astype(jnp.int8)

    # ---- noise ----
    if cfg.p_noise > 0:
        var = jax.random.uniform(keys[3], (), minval=0.0, maxval=0.1)
        do = jax.random.uniform(keys[4]) < cfg.p_noise
        noise = jax.random.normal(keys[5], data.shape) * jnp.sqrt(var)
        data = jnp.where(do, data + noise, data)

    # ---- blur ----
    if cfg.p_blur > 0:
        sigma = jax.random.uniform(keys[6], (), minval=cfg.blur_sigma[0], maxval=cfg.blur_sigma[1])
        do = jax.random.uniform(keys[7]) < cfg.p_blur
        data = jnp.where(do, _blur(data, sigma, dim), data)

    # ---- brightness / contrast ----
    if cfg.p_brightness > 0:
        m = jax.random.uniform(keys[8], (), minval=0.75, maxval=1.25)
        do = jax.random.uniform(keys[9]) < cfg.p_brightness
        data = jnp.where(do, data * m, data)
    if cfg.p_contrast > 0:
        f = jax.random.uniform(keys[10], (), minval=0.75, maxval=1.25)
        do = jax.random.uniform(keys[11]) < cfg.p_contrast
        mean = data.mean(axis=tuple(range(dim)), keepdims=True)
        mn = data.min(axis=tuple(range(dim)), keepdims=True)
        mx = data.max(axis=tuple(range(dim)), keepdims=True)
        dc = jnp.clip((data - mean) * f + mean, mn, mx)
        data = jnp.where(do, dc, data)

    # ---- gamma (inverted then regular), retain stats ----
    # fresh keys for gamma/mirror — re-splitting keys[0] (already consumed by
    # the spatial transform) would make gamma a deterministic function of the
    # rotation draw
    kg = keys[12:18]
    def gamma_tf(x, k1, k2, p, invert):
        g = jax.random.uniform(k1, (), minval=cfg.gamma_range[0], maxval=cfg.gamma_range[1])
        do = jax.random.uniform(k2) < p
        mean = x.mean(); std = x.std()
        mn = x.min(); rng_ = x.max() - mn + 1e-7
        xn = (x - mn) / rng_
        xn = jnp.where(invert, 1.0 - xn, xn)
        xg = jnp.power(jnp.clip(xn, 1e-7, 1.0), g)
        xg = jnp.where(invert, 1.0 - xg, xg)
        xg = xg * rng_ + mn
        xg = (xg - xg.mean()) / (xg.std() + 1e-7) * std + mean  # retain stats
        return jnp.where(do, xg, x)
    if cfg.p_gamma_inverted > 0:
        data = gamma_tf(data, kg[0], kg[1], cfg.p_gamma_inverted, True)
    if cfg.p_gamma > 0:
        data = gamma_tf(data, kg[2], kg[3], cfg.p_gamma, False)

    # ---- mirroring ----
    if cfg.do_mirror:
        km = jax.random.split(kg[4], dim)
        for a in cfg.mirror_axes:
            if a >= dim:
                continue
            do = jax.random.uniform(km[a]) < 0.5
            data = jnp.where(do, jnp.flip(data, axis=a), data)
            seg = jnp.where(do, jnp.flip(seg, axis=a), seg)
    return data, seg


@partial(jax.jit, static_argnames=("cfg",))
def augment_batch(key, data, seg, cfg: AugmentConfig = AugmentConfig()):
    """data [B, *patch, C] float32, seg [B, *patch] int8."""
    keys = jax.random.split(key, data.shape[0])
    return jax.vmap(lambda k, d, s: _augment_one(k, d, s, cfg))(keys, data, seg)
