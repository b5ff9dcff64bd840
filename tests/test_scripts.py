"""Scripts: dataset conversion, label mapping, join/delete/split,
checkpoint path updates (analog of the reference's
test_dataset_label_mapping.py)."""

import json
import os

import numpy as np
import pytest

from lifelong_nnunet_tpu.scripts.dataset_label_mapping import (
    apply_label_mapping, convert_task, parse_mapping_file, select_channel,
    split_4d)
from lifelong_nnunet_tpu.scripts.join_datasets import join_tasks
from lifelong_nnunet_tpu.scripts.create_split import create_split
from lifelong_nnunet_tpu.scripts.update_checkpoints import update_tree
from lifelong_nnunet_tpu.utilities.nifti import NiftiImage, read, write


def test_apply_label_mapping():
    seg = np.array([[0, 1], [2, 3]], dtype=np.int16)
    out = apply_label_mapping(seg, {1: 2, 2: 1})
    np.testing.assert_array_equal(out, [[0, 2], [1, 0]])  # unmapped -> 0


def test_parse_mapping_file(tmp_path):
    p = tmp_path / "map.json"
    with open(p, "w") as f:
        json.dump({"left hippocampus --> 1": 1, "right hippocampus --> 2": 1}, f)
    assert parse_mapping_file(str(p)) == {1: 1, 2: 1}


def test_select_channel():
    x = np.random.rand(4, 4, 4, 3).astype(np.float32)
    np.testing.assert_array_equal(select_channel(x, 1), x[..., 1])


def test_split_4d_and_convert(tmp_path):
    src = tmp_path / "Task001_Src"
    (src / "imagesTr").mkdir(parents=True)
    (src / "labelsTr").mkdir()
    rng = np.random.RandomState(0)
    img4d = rng.rand(8, 8, 8, 2).astype(np.float32)
    seg = rng.randint(0, 3, (8, 8, 8)).astype(np.uint8)
    write(str(src / "imagesTr" / "case_a.nii.gz"), NiftiImage(img4d))
    write(str(src / "labelsTr" / "case_a.nii.gz"), NiftiImage(seg))
    with open(src / "dataset.json", "w") as f:
        json.dump({"modality": {"0": "MRI", "1": "CT"},
                   "labels": {"0": "bg", "1": "a", "2": "b"}}, f)

    dst = tmp_path / "Task002_Dst"
    convert_task(str(src), str(dst), mapping={1: 1, 2: 1})
    imgs = sorted(os.listdir(dst / "imagesTr"))
    assert imgs == ["case_a_0000.nii.gz", "case_a_0001.nii.gz"]
    np.testing.assert_allclose(
        np.asarray(read(str(dst / "imagesTr" / imgs[0])).data), img4d[..., 0],
        rtol=1e-6)
    seg2 = np.asarray(read(str(dst / "labelsTr" / "case_a.nii.gz")).data)
    assert set(np.unique(seg2)).issubset({0, 1})  # labels joined via mapping


def test_join_tasks(tmp_path):
    for name in ("Task003_A", "Task004_B"):
        d = tmp_path / name
        (d / "imagesTr").mkdir(parents=True)
        (d / "labelsTr").mkdir()
        write(str(d / "imagesTr" / "x_0000.nii.gz"),
              NiftiImage(np.zeros((4, 4, 4), np.float32)))
        write(str(d / "labelsTr" / "x.nii.gz"),
              NiftiImage(np.zeros((4, 4, 4), np.uint8)))
        with open(d / "dataset.json", "w") as f:
            json.dump({"modality": {"0": "MRI"}, "labels": {"0": "bg"}}, f)
    out = tmp_path / "Task005_Joined"
    n = join_tasks([str(tmp_path / "Task003_A"), str(tmp_path / "Task004_B")],
                   str(out))
    assert n == 4
    assert sorted(os.listdir(out / "imagesTr")) == [
        "Task003_A_x_0000.nii.gz", "Task004_B_x_0000.nii.gz"]


def test_create_split(synthetic_task, tmp_path):
    import shutil
    td = tmp_path / "TaskCopy"
    shutil.copytree(synthetic_task, td)
    moved = create_split(str(td), test_fraction=0.34)
    assert len(moved) == 2  # 34% of 6
    assert len(os.listdir(td / "imagesTs")) == 2
    assert len(os.listdir(td / "labelsTr")) == 4


def test_update_checkpoints(tmp_path):
    with open(tmp_path / "m.json", "w") as f:
        json.dump({"path": "/old/root/x", "nested": ["/old/root/y", 3]}, f)
    n = update_tree(str(tmp_path), "/old/root", "/new/base", verbose=False)
    assert n == 1
    with open(tmp_path / "m.json") as f:
        d = json.load(f)
    assert d["path"] == "/new/base/x" and d["nested"][0] == "/new/base/y"
