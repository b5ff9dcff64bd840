"""M0 tests: NIfTI round-trip, fingerprint, planning, preprocessing."""

import json
import os

import numpy as np
import pytest

from lifelong_nnunet_tpu.planning.fingerprint import (
    analyze_dataset, crop_to_nonzero, list_cases)
from lifelong_nnunet_tpu.planning.plans import plan_experiment, Plans
from lifelong_nnunet_tpu.planning.preprocess import (
    preprocess_task, resample_image)
from lifelong_nnunet_tpu.utilities.nifti import NiftiImage, read, write


def test_nifti_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    data = rng.normal(size=(11, 13, 7)).astype(np.float32)
    p = str(tmp_path / "x.nii.gz")
    write(p, NiftiImage(data, spacing=(1.5, 0.7, 2.0)))
    img = read(p)
    np.testing.assert_allclose(img.data, data, rtol=1e-6)
    np.testing.assert_allclose(img.spacing, (1.5, 0.7, 2.0), rtol=1e-5)


def test_nifti_int_roundtrip(tmp_path):
    seg = (np.arange(4 * 5 * 6).reshape(4, 5, 6) % 3).astype(np.uint8)
    p = str(tmp_path / "seg.nii.gz")
    write(p, NiftiImage(seg))
    img = read(p)
    np.testing.assert_array_equal(img.data, seg)


def test_crop_to_nonzero():
    data = np.zeros((1, 10, 10, 10), dtype=np.float32)
    data[0, 2:7, 3:9, 1:5] = 1.0
    seg = np.ones((10, 10, 10), dtype=np.int8)
    d, s, bbox, mask = crop_to_nonzero(data, seg)
    assert d.shape == (1, 5, 6, 4)
    assert bbox == [(2, 7), (3, 9), (1, 5)]
    assert mask.all()


def test_resample_shapes():
    data = np.random.RandomState(0).normal(size=(2, 20, 24, 16)).astype(np.float32)
    out = resample_image(data, (1.0, 1.0, 2.0), (2.0, 2.0, 2.0), is_seg=False)
    assert out.shape == (2, 10, 12, 16)
    seg = np.zeros((1, 20, 24, 16), dtype=np.float32)
    seg[0, 5:15, 5:15, 5:10] = 1
    out_s = resample_image(seg, (1.0, 1.0, 2.0), (2.0, 2.0, 2.0), is_seg=True)
    assert out_s.shape == (1, 10, 12, 16)
    assert set(np.unique(out_s)).issubset({0.0, 1.0})


def test_fingerprint_and_plan(synthetic_task):
    fp = analyze_dataset(synthetic_task)
    assert len(fp["cases"]) == 6
    assert fp["all_classes"] == [1, 2]
    assert fp["intensity_properties"][0] is not None

    plans = plan_experiment(fp)
    cfg = plans.config("3d_fullres")
    assert len(cfg.patch_size) == 3
    # patch must be a multiple of the total pool stride per axis
    total = np.prod(np.array(cfg.pool_op_kernel_sizes), axis=0)
    assert all(p % t == 0 for p, t in zip(cfg.patch_size, total))
    assert cfg.batch_size >= 2
    assert "2d" in plans.configurations
    assert len(plans.config("2d").patch_size) == 2


def test_plans_json_roundtrip(synthetic_task, tmp_path):
    plans = plan_experiment(analyze_dataset(synthetic_task))
    p = str(tmp_path / "plans.json")
    plans.save(p)
    plans2 = Plans.load(p)
    assert plans2.config("3d_fullres").patch_size == plans.config("3d_fullres").patch_size
    assert plans2.num_classes == 2
    assert 0 in plans2.normalization_schemes


def test_preprocess_task_keyed_by_actual_task(synthetic_task, synthetic_task_b,
                                              tmp_path):
    """Under the first-task geometry invariant later tasks reuse task A's
    plans; their preprocessed arrays must still land in their OWN task dir
    (regression: keying by plans.task aliased every task onto one directory
    because case ids repeat across synthetic tasks)."""
    plans = plan_experiment(analyze_dataset(synthetic_task))
    out_a = preprocess_task(synthetic_task, plans, str(tmp_path),
                            configs=("3d_fullres",))["3d_fullres"]
    out_b = preprocess_task(synthetic_task_b, plans, str(tmp_path),
                            configs=("3d_fullres",))["3d_fullres"]
    assert out_a != out_b
    assert "Task097_SynthA" in out_a and "Task098_SynthB" in out_b
    case = list_cases(synthetic_task)[0]
    a = np.load(os.path.join(out_a, f"{case}.npy"))
    b = np.load(os.path.join(out_b, f"{case}.npy"))
    assert not np.array_equal(a, b)


def test_preprocess_task(synthetic_task, tmp_path):
    plans = plan_experiment(analyze_dataset(synthetic_task))
    out = preprocess_task(synthetic_task, plans, str(tmp_path), configs=("3d_fullres",))
    stage = out["3d_fullres"]
    cases = list_cases(synthetic_task)
    for case in cases:
        arr = np.load(os.path.join(stage, f"{case}.npy"))
        assert arr.shape[0] == 2  # 1 modality + seg
        img, seg = arr[0], arr[1]
        # normalized intensities: roughly zero-mean inside the mask
        assert abs(img[seg >= 0].mean()) < 0.5
        assert set(np.unique(seg)).issubset({-1.0, 0.0, 1.0, 2.0})
        with open(os.path.join(stage, f"{case}.props.json")) as f:
            props = json.load(f)
        assert props["resampled_shape"] == list(seg.shape)
        locs = np.load(os.path.join(stage, f"{case}.classlocs.npz"))
        assert "1" in locs and "2" in locs


def test_3d_lowres_planned_for_large_datasets():
    """Datasets whose median volume greatly exceeds the patch budget get a
    3d_lowres configuration (nnU-Net rule)."""
    cases = [f"c{i}" for i in range(10)]
    fp = {
        "task": "Task900_Big", "modalities": {0: "CT"},
        "labels": {0: "bg", 1: "organ"}, "all_classes": [1],
        "cases": cases,
        "shapes_after_crop": {c: (512, 512, 512) for c in cases},
        "spacings": {c: (1.0, 1.0, 1.0) for c in cases},
        "size_reductions": {c: 1.0 for c in cases},
        "intensity_properties": {0: {"mean": 0.0, "sd": 1.0,
                                     "percentile_00_5": -100.0,
                                     "percentile_99_5": 100.0,
                                     "median": 0.0, "min": -1000.0,
                                     "max": 1000.0}},
    }
    plans = plan_experiment(fp)
    assert "3d_lowres" in plans.configurations
    low = plans.config("3d_lowres")
    full = plans.config("3d_fullres")
    assert np.prod(low.spacing) > np.prod(full.spacing)  # coarser voxels
    assert all(p <= 256 for p in full.patch_size)  # budget respected


def test_transpose_forward_planning_and_roundtrip(tmp_path):
    """Anisotropic data (coarse LAST axis): the planner must put the coarse
    axis first (transpose_forward), preprocessing must emit arrays in that
    order, and restore_softmax must return predictions in ORIGINAL axis order
    (reference plans surgery + un-transpose, inference/predict.py:224-226,354-362)."""
    from lifelong_nnunet_tpu.planning.plans import determine_transpose
    from lifelong_nnunet_tpu.inference.predict import (
        preprocess_for_inference, restore_softmax)
    from tests.synthetic import make_synthetic_task

    assert determine_transpose(np.array([1.0, 1.0, 4.0]))[0] == [2, 0, 1]
    assert determine_transpose(np.array([4.0, 1.0, 1.0]))[0] == [0, 1, 2]

    td = make_synthetic_task(str(tmp_path / "raw"), num_cases=4, seed=1,
                             shape=(20, 24, 28), spacing=(1.0, 1.0, 4.0))
    plans = plan_experiment(analyze_dataset(td))
    assert plans.transpose_forward == [2, 0, 1]
    assert plans.transpose_backward == [1, 2, 0]
    cfg = plans.config("3d_fullres")
    # plans spacing is in transposed order: coarse axis first
    assert cfg.spacing[0] == max(cfg.spacing)

    # preprocessed training arrays live in transposed space
    stage = preprocess_task(td, plans, str(tmp_path / "pre"),
                            configs=("3d_fullres",))["3d_fullres"]
    case = sorted(c[:-4] for c in os.listdir(stage) if c.endswith(".npy"))[0]
    arr = np.load(os.path.join(stage, f"{case}.npy"))
    props = json.load(open(os.path.join(stage, f"{case}.props.json")))
    assert props["transpose_forward"] == [2, 0, 1]
    assert list(arr.shape[1:]) == props["resampled_shape"]
    # spacings all equal target -> no resample; the 2-voxel zero border crops
    # (20,24,28) to (16,20,24), transposed by [2,0,1] to (24,16,20)
    assert tuple(arr.shape[1:]) == (24, 16, 20)

    # inference prep + restore round-trip back to ORIGINAL axis order,
    # bit-exact for an identity "model" (monotone map of the input values)
    img_file = os.path.join(td, "imagesTr", f"{case}_0000.nii.gz")
    data, iprops = preprocess_for_inference([img_file], plans, "3d_fullres")
    assert list(data.shape[:-1]) == iprops["resampled_shape"]
    probs = np.concatenate([np.zeros_like(data), data], axis=-1)
    full = restore_softmax(probs, iprops)
    assert full.shape == (20, 24, 28, 2)
    # inside the crop box (in original order) values must match the
    # preprocessed voxels transposed back — verifies axes were not mixed up
    tb = [1, 2, 0]
    back = np.ascontiguousarray(data[..., 0].transpose(tb))
    bbox_t = iprops["crop_bbox"]          # in transposed space
    bbox_orig = [bbox_t[tb[a]] for a in range(3)]
    sl = tuple(slice(b[0], b[1]) for b in bbox_orig)
    np.testing.assert_array_equal(full[sl][..., 1], back)
    assert full[..., 0].flat[0] == 1.0    # outside crop = background
