"""C++ patch-gather engine: exact equivalence with the numpy path."""

import numpy as np
import pytest

from lifelong_nnunet_tpu.data import native


requires_native = pytest.mark.skipif(native.get_lib() is None,
                                     reason="no g++ toolchain")


@requires_native
def test_gather_matches_numpy_inside_volume():
    rng = np.random.RandomState(0)
    arr = rng.rand(3, 20, 22, 18).astype(np.float32)  # 2 modalities + seg
    arr[2] = rng.randint(-1, 3, (20, 22, 18))
    data, seg = native.gather_patches([arr], np.array([[2, 3, 1]]), (8, 8, 8))
    assert data.shape == (1, 8, 8, 8, 2) and seg.shape == (1, 8, 8, 8)
    expected = np.moveaxis(arr[:2, 2:10, 3:11, 1:9], 0, -1)
    np.testing.assert_array_equal(data[0], expected)
    np.testing.assert_array_equal(seg[0], arr[2, 2:10, 3:11, 1:9].astype(np.int8))


@requires_native
def test_gather_padding_matches_numpy():
    rng = np.random.RandomState(1)
    arr = rng.rand(2, 10, 10, 10).astype(np.float32)
    arr[1] = rng.randint(0, 3, (10, 10, 10))
    # origin partially outside on all sides
    data, seg = native.gather_patches([arr], np.array([[-3, 5, 8]]), (8, 8, 8))
    # padded areas: data 0, seg -1
    assert (data[0, :3] == 0).all()
    assert (seg[0, :3] == -1).all()
    assert (seg[0, :, 5:] == -1).all()   # y: 5+8=13 > 10 -> last 3 padded
    assert (seg[0, :, :, 2:] == -1).all()  # z: 8+8=16 -> only 2 valid
    np.testing.assert_array_equal(
        data[0, 3:, :5, :2, 0], arr[0, 0:5, 5:10, 8:10])


@requires_native
def test_sampler_native_equals_numpy_path(synthetic_task, tmp_path):
    from lifelong_nnunet_tpu.planning.fingerprint import analyze_dataset
    from lifelong_nnunet_tpu.planning.plans import plan_experiment
    from lifelong_nnunet_tpu.planning.preprocess import preprocess_task
    from lifelong_nnunet_tpu.data.dataset import PreprocessedDataset
    from lifelong_nnunet_tpu.data.sampler import PatchSampler
    plans = plan_experiment(analyze_dataset(synthetic_task))
    stage = preprocess_task(synthetic_task, plans, str(tmp_path),
                            configs=("3d_fullres",))["3d_fullres"]
    ds = PreprocessedDataset(stage)
    s1 = PatchSampler(ds, ds.cases, (16, 16, 16), 4, seed=5)
    s2 = PatchSampler(ds, ds.cases, (16, 16, 16), 4, seed=5)
    s2._native = False  # force numpy path
    b1, b2 = s1.next_batch(), s2.next_batch()
    assert b1["keys"] == b2["keys"]
    np.testing.assert_array_equal(b1["data"], b2["data"])
    np.testing.assert_array_equal(b1["seg"], b2["seg"])


@requires_native
def test_gather_multithreaded_large_batch():
    rng = np.random.RandomState(2)
    arrs = [rng.rand(2, 24, 24, 24).astype(np.float32) for _ in range(16)]
    origins = rng.randint(-4, 20, size=(16, 3)).astype(np.int64)
    d1, s1 = native.gather_patches(arrs, origins, (12, 12, 12), n_threads=8)
    d2, s2 = native.gather_patches(arrs, origins, (12, 12, 12), n_threads=1)
    np.testing.assert_array_equal(d1, d2)
    np.testing.assert_array_equal(s1, s2)
