"""Shear-decomposed affine resampling: equivalence with the gather path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lifelong_nnunet_tpu.data.augment import (_base_grid, _rot_matrix_3d,
                                              sample_linear, sample_nearest)
from lifelong_nnunet_tpu.ops.shear_resample import affine_resample_shear


def smooth_volume(shape, seed=0):
    rng = np.random.RandomState(seed)
    small = rng.rand(*[max(2, s // 4) for s in shape])
    x = jax.image.resize(jnp.asarray(small), shape, method="cubic")
    return np.asarray(x)[..., None].astype(np.float32)


def gather_reference(data, seg, angles, scale):
    patch = data.shape[:-1]
    dim = len(patch)
    grid = _base_grid(patch)
    center = jnp.array([(s - 1) / 2.0 for s in patch]).reshape(dim, *([1] * dim))
    g = grid - center
    rot = _rot_matrix_3d(jnp.asarray(angles))
    g = jnp.einsum("ij,j...->i...", rot, g) * scale
    coords = g + center
    d = sample_linear(jnp.asarray(data), coords, cval=0.0)
    s = sample_nearest(jnp.asarray(seg).astype(jnp.float32), coords, cval=-1.0)
    return np.asarray(d), np.asarray(s)


def test_identity_exact():
    data = smooth_volume((12, 14, 12))
    seg = (data[..., 0] > 0.5).astype(np.int8)
    d, s = affine_resample_shear(jnp.asarray(data), jnp.asarray(seg),
                                 jnp.zeros(3), jnp.asarray(1.0))
    np.testing.assert_allclose(np.asarray(d), data, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(s), seg)


def test_scale_matches_gather():
    data = smooth_volume((16, 16, 16))
    seg = (data[..., 0] > 0.5).astype(np.int8)
    d, s = affine_resample_shear(jnp.asarray(data), jnp.asarray(seg),
                                 jnp.zeros(3), jnp.asarray(1.3))
    dr, sr = gather_reference(data, seg, np.zeros(3), 1.3)
    # interior agreement (borders differ: zero-pad vs shear-out)
    sl = (slice(3, -3),) * 3
    np.testing.assert_allclose(np.asarray(d)[sl + (0,)], dr[sl + (0,)], atol=2e-2)


@pytest.mark.parametrize("angles", [(0.3, 0.0, 0.0), (0.0, -0.25, 0.0),
                                    (0.0, 0.0, 0.4), (0.2, -0.15, 0.3)])
def test_rotation_matches_gather(angles):
    data = smooth_volume((18, 18, 18), seed=3)
    seg = (data[..., 0] > 0.5).astype(np.int8)
    d, s = affine_resample_shear(jnp.asarray(data), jnp.asarray(seg),
                                 jnp.asarray(angles), jnp.asarray(1.0))
    dr, sr = gather_reference(data, seg, angles, 1.0)
    sl = (slice(5, -5),) * 3
    diff = np.abs(np.asarray(d)[sl + (0,)] - dr[sl + (0,)])
    assert diff.mean() < 0.02, diff.mean()   # repeated-interp smoothing only
    # segmentation agreement in the interior
    agree = np.mean(np.asarray(s)[sl] == sr[sl])
    assert agree > 0.95, agree


def test_seg_labels_preserved_and_border_ignore():
    data = smooth_volume((16, 16, 16))
    seg = np.zeros((16, 16, 16), np.int8)
    seg[5:11, 5:11, 5:11] = 2
    d, s = affine_resample_shear(jnp.asarray(data), jnp.asarray(seg),
                                 jnp.asarray([0.5, 0.3, -0.4]), jnp.asarray(1.2))
    s = np.asarray(s)
    assert set(np.unique(s)).issubset({-1, 0, 2})
    assert (s == -1).any()       # sheared-out borders decode to ignore
    assert (s == 2).any()


def test_lowres_pitch():
    data = smooth_volume((16, 16, 16))
    seg = np.zeros((16, 16, 16), np.int8)
    d, _ = affine_resample_shear(jnp.asarray(data), jnp.asarray(seg),
                                 jnp.zeros(3), jnp.asarray(1.0),
                                 lowres_pitch=jnp.asarray(2.0))
    d = np.asarray(d)[..., 0]
    # snapped sampling: consecutive pairs along each axis are identical
    np.testing.assert_allclose(d[0], d[1], atol=1e-5)


def test_augment_matmul_mode_end_to_end():
    from lifelong_nnunet_tpu.data.augment import AugmentConfig, augment_batch
    rng = np.random.RandomState(0)
    data = jnp.asarray(rng.rand(2, 16, 16, 16, 1).astype(np.float32))
    seg = jnp.asarray(rng.randint(-1, 3, (2, 16, 16, 16)).astype(np.int8))
    cfg = AugmentConfig(spatial_mode="matmul")
    d, s = augment_batch(jax.random.PRNGKey(0), data, seg, cfg)
    assert d.shape == data.shape and s.shape == seg.shape
    assert set(np.unique(np.asarray(s))).issubset({-1, 0, 1, 2})
    d2, s2 = augment_batch(jax.random.PRNGKey(0), data, seg, cfg)
    np.testing.assert_allclose(np.asarray(d), np.asarray(d2), atol=1e-6)
