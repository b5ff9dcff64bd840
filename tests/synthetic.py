"""Synthetic Decathlon-style dataset generator for tests.

Produces small 3D MRI-like volumes containing two labeled structures (an
ellipsoid = class 1 with a brighter core = class 2) so that segmentation is
learnable by a small U-Net in a few hundred steps — the test-tier stand-in
for Task04_Hippocampus (SURVEY.md §4)."""

from __future__ import annotations

import json
import os

import numpy as np

from lifelong_nnunet_tpu.utilities.nifti import NiftiImage, write


def _make_case(rng: np.random.RandomState, shape, intensity_shift=0.0):
    img = rng.normal(0.1, 0.05, size=shape).astype(np.float32)
    seg = np.zeros(shape, dtype=np.uint8)
    zz, yy, xx = np.meshgrid(*[np.arange(s) for s in shape], indexing="ij")
    center = np.array(shape) / 2 + rng.uniform(-3, 3, size=3)
    radii = np.array(shape) * rng.uniform(0.18, 0.28, size=3)
    d = (((zz - center[0]) / radii[0]) ** 2 + ((yy - center[1]) / radii[1]) ** 2
         + ((xx - center[2]) / radii[2]) ** 2)
    body = d < 1.0
    core = d < 0.25
    img[body] += 0.5 + intensity_shift
    img[core] += 0.4
    seg[body] = 1
    seg[core] = 2
    img += rng.normal(0, 0.03, size=shape).astype(np.float32)
    # zero border so crop-to-nonzero has work to do
    img = np.pad(img[2:-2, 2:-2, 2:-2], 2, mode="constant")
    seg[:2] = 0; seg[-2:] = 0
    return np.abs(img).astype(np.float32), seg


def make_synthetic_task(root: str, task_name="Task097_SynthA", num_cases=6, seed=0,
                        shape=(28, 36, 28), spacing=(1.0, 1.0, 1.0), intensity_shift=0.0):
    rng = np.random.RandomState(seed)
    task_dir = os.path.join(root, task_name)
    os.makedirs(os.path.join(task_dir, "imagesTr"), exist_ok=True)
    os.makedirs(os.path.join(task_dir, "labelsTr"), exist_ok=True)
    os.makedirs(os.path.join(task_dir, "imagesTs"), exist_ok=True)
    cases = []
    for i in range(num_cases):
        case = f"synth_{i:03d}"
        img, seg = _make_case(rng, shape, intensity_shift)
        write(os.path.join(task_dir, "imagesTr", f"{case}_0000.nii.gz"),
              NiftiImage(img, spacing=spacing))
        write(os.path.join(task_dir, "labelsTr", f"{case}.nii.gz"),
              NiftiImage(seg, spacing=spacing))
        cases.append(case)
    djson = {
        "name": task_name,
        "modality": {"0": "MRI"},
        "labels": {"0": "background", "1": "body", "2": "core"},
        "numTraining": num_cases,
        "training": [{"image": f"./imagesTr/{c}.nii.gz", "label": f"./labelsTr/{c}.nii.gz"}
                     for c in cases],
    }
    with open(os.path.join(task_dir, "dataset.json"), "w") as f:
        json.dump(djson, f)
    return task_dir
