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
