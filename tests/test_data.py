"""Data pipeline tests: splits, patch sampling, device augmentation."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lifelong_nnunet_tpu.data.dataset import (PreprocessedDataset, kfold_split,
                                              param_search_split)
from lifelong_nnunet_tpu.data.sampler import PatchSampler
from lifelong_nnunet_tpu.data.augment import (AugmentConfig, NO_AUGMENT,
                                              augment_batch, sample_linear,
                                              sample_nearest, _base_grid)


@pytest.fixture(scope="module")
def stage(synthetic_task, tmp_path_factory):
    from lifelong_nnunet_tpu.planning.fingerprint import analyze_dataset
    from lifelong_nnunet_tpu.planning.plans import plan_experiment
    from lifelong_nnunet_tpu.planning.preprocess import preprocess_task
    plans = plan_experiment(analyze_dataset(synthetic_task))
    out = preprocess_task(synthetic_task, plans, str(tmp_path_factory.mktemp("pre")),
                          configs=("3d_fullres",))
    return out["3d_fullres"], plans


def test_kfold_split_deterministic():
    cases = [f"c{i:02d}" for i in range(10)]
    tr1, val1 = kfold_split(cases, 0)
    tr2, val2 = kfold_split(cases, 0)
    assert tr1 == tr2 and val1 == val2
    assert len(tr1) == 8 and len(val1) == 2
    assert set(tr1) | set(val1) == set(cases)
    # all folds cover every case exactly once as val
    vals = sum((kfold_split(cases, f)[1] for f in range(5)), [])
    assert sorted(vals) == sorted(cases)


def test_param_search_split():
    cases = [f"c{i}" for i in range(10)]
    tr, val = param_search_split(cases)
    assert len(val) == 2 and len(tr) == 8
    assert set(tr) | set(val) == set(cases)
    assert param_search_split(cases) == (tr, val)


def test_patch_sampler(stage):
    stage_dir, plans = stage
    ds = PreprocessedDataset(stage_dir)
    cfg = plans.config("3d_fullres")
    sampler = PatchSampler(ds, ds.cases, cfg.patch_size, batch_size=4, seed=1)
    batch = sampler.next_batch()
    assert batch["data"].shape == (4,) + tuple(cfg.patch_size) + (1,)
    assert batch["seg"].shape == (4,) + tuple(cfg.patch_size)
    assert batch["data"].dtype == np.float32
    # forced-fg samples must contain foreground
    n_fg_forced = 4 - round(4 * (1 - sampler.oversample))
    for i in range(4 - n_fg_forced, 4):
        assert (batch["seg"][i] > 0).any(), f"sample {i} forced-fg has no fg"


def test_patch_sampler_sharded(stage):
    """Multi-host input split: each shard emits its contiguous slice of the
    global batch; the forced-fg rule follows GLOBAL positions; RNG streams
    decorrelate."""
    stage_dir, plans = stage
    ds = PreprocessedDataset(stage_dir)
    cfg = plans.config("3d_fullres")
    s0 = PatchSampler(ds, ds.cases, cfg.patch_size, batch_size=6, seed=5,
                      shard=(0, 2))
    s1 = PatchSampler(ds, ds.cases, cfg.patch_size, batch_size=6, seed=5,
                      shard=(1, 2))
    assert s0.batch_size == s1.batch_size == 3
    # global rule: round(6*0.67)=4 -> global positions 4,5 forced-fg
    assert [s0._needs_fg(i) for i in range(3)] == [False, False, False]
    assert [s1._needs_fg(i) for i in range(3)] == [False, True, True]
    b0, b1 = s0.next_batch(), s1.next_batch()
    assert b0["data"].shape == (3,) + tuple(cfg.patch_size) + (1,)
    assert b1["data"].shape == (3,) + tuple(cfg.patch_size) + (1,)
    # forced-fg shard rows actually contain foreground
    for i in (1, 2):
        assert (b1["seg"][i] > 0).any()
    # decorrelated streams: shards must not sample identical patches
    assert not np.array_equal(b0["data"], b1["data"])
    with pytest.raises(ValueError):
        PatchSampler(ds, ds.cases, cfg.patch_size, batch_size=5, shard=(0, 2))


def test_prefetcher_put_single_process():
    """Single-process _put == device_put (the multi-host branch needs >1
    process); with a sharding it must produce a committed sharded array."""
    from lifelong_nnunet_tpu.data.pipeline import Prefetcher
    arr = np.arange(24, dtype=np.float32).reshape(8, 3)
    out = Prefetcher._put(arr, None)
    np.testing.assert_array_equal(np.asarray(out), arr)
    if len(jax.devices()) >= 2:
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
        mesh = Mesh(np.array(jax.devices()[:2]), ("data",))
        sh = NamedSharding(mesh, P("data", None))
        out = Prefetcher._put(arr, sh)
        assert out.sharding.is_equivalent_to(sh, arr.ndim)
        np.testing.assert_array_equal(np.asarray(out), arr)


def test_patch_sampler_pads_small_volume(stage):
    stage_dir, plans = stage
    ds = PreprocessedDataset(stage_dir)
    big_patch = [48, 48, 48]  # larger than the ~24-32 volumes
    sampler = PatchSampler(ds, ds.cases, big_patch, batch_size=2, seed=2)
    batch = sampler.next_batch()
    assert batch["data"].shape == (2, 48, 48, 48, 1)
    assert (batch["seg"] == -1).any()  # padding present


def test_sample_linear_identity():
    vol = jnp.arange(4 * 5 * 6, dtype=jnp.float32).reshape(4, 5, 6)[..., None]
    coords = _base_grid((4, 5, 6))
    out = sample_linear(vol, coords)
    np.testing.assert_allclose(out, vol, atol=1e-5)
    out_n = sample_nearest(vol, coords)
    np.testing.assert_allclose(out_n, vol, atol=1e-5)


def test_sample_out_of_bounds_cval():
    vol = jnp.ones((4, 4, 4, 1))
    coords = _base_grid((4, 4, 4)) + 10.0
    out = sample_linear(vol, coords, cval=0.0)
    assert float(jnp.abs(out).max()) == 0.0


def test_augment_no_op():
    rng = np.random.RandomState(0)
    data = jnp.asarray(rng.normal(size=(2, 8, 8, 8, 1)).astype(np.float32))
    seg = jnp.asarray((rng.rand(2, 8, 8, 8) > 0.5).astype(np.int8))
    d2, s2 = augment_batch(jax.random.PRNGKey(0), data, seg, NO_AUGMENT)
    np.testing.assert_allclose(d2, data, atol=1e-5)
    np.testing.assert_array_equal(s2, seg)


def test_augment_shapes_and_determinism():
    rng = np.random.RandomState(0)
    data = jnp.asarray(rng.normal(size=(4, 16, 16, 16, 2)).astype(np.float32))
    seg = jnp.asarray(rng.randint(-1, 3, size=(4, 16, 16, 16)).astype(np.int8))
    key = jax.random.PRNGKey(42)
    d1, s1 = augment_batch(key, data, seg)
    d2, s2 = augment_batch(key, data, seg)
    assert d1.shape == data.shape and s1.shape == seg.shape
    np.testing.assert_allclose(d1, d2, atol=1e-6)  # same key -> same aug
    assert s1.dtype == jnp.int8
    assert set(np.unique(np.asarray(s1))).issubset({-1, 0, 1, 2})
    d3, _ = augment_batch(jax.random.PRNGKey(43), data, seg)
    assert not np.allclose(d1, d3)  # different key -> different aug


def test_augment_2d():
    rng = np.random.RandomState(0)
    data = jnp.asarray(rng.normal(size=(2, 16, 16, 1)).astype(np.float32))
    seg = jnp.asarray(rng.randint(0, 2, size=(2, 16, 16)).astype(np.int8))
    d, s = augment_batch(jax.random.PRNGKey(0), data, seg)
    assert d.shape == data.shape and s.shape == seg.shape
