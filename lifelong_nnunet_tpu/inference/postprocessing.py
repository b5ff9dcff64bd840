"""Connected-component postprocessing decision harness.

Upstream nnU-Net's ``determine_postprocessing`` (a dependency of the
reference's inference path — ``inference/predict.py:265-283`` loads the
resulting ``postprocessing.json``) decides per class whether keeping only the
largest connected component improves Dice on held-out training predictions.
Here: run sliding-window predictions on the validation split, compare Dice
with/without largest-component filtering per foreground class, and persist
the decision next to the checkpoints; ``predict_from_folder`` callers can
load it via ``load_postprocessing``.
"""

from __future__ import annotations

import json
import os

import numpy as np

from ..evaluation.metrics import dice_from_counts, confusion_counts
from .predict import remove_all_but_largest_component
from .sliding_window import bucket_shape, predict_sliding_window


def determine_postprocessing(trainer, task: str, output_folder: str | None = None,
                             min_gain: float = 0.0) -> dict:
    """Evaluate largest-component filtering per class on the task's val split.
    Returns {"for_which_classes": [cls, ...], "dice_raw": {...},
    "dice_pp": {...}} and writes postprocessing.json."""
    ds, _tr, val = trainer._datasets[task]
    head = task if task in trainer.mh.tasks else trainer.mh.tasks[-1]
    params = trainer.mh.assemble(head)
    apply_fn = lambda p, x: trainer.model.apply({"params": p}, x)
    nc = trainer.num_classes
    counts_raw = np.zeros((nc - 1, 3), np.int64)
    counts_pp = np.zeros((nc - 1, 3), np.int64)
    for case in val:
        arr = np.asarray(ds.load(case))
        data = np.moveaxis(arr[:-1], 0, -1)
        seg = arr[-1].astype(np.int32)
        bshape = bucket_shape(data.shape[:-1], trainer.patch_size)
        pad = [(0, b - s) for s, b in zip(data.shape[:-1], bshape)] + [(0, 0)]
        pred = predict_sliding_window(
            apply_fn, params, np.pad(data, pad), trainer.patch_size, nc,
            mirror_axes=(), window_batch=8, output="seg", input_bf16=True)
        pred = pred[tuple(slice(0, s) for s in data.shape[:-1])].astype(np.int32)
        pred_pp = remove_all_but_largest_component(pred)
        for j, p in ((0, pred), (1, pred_pp)):
            tp, fp, fn = confusion_counts(p, seg, nc)
            (counts_raw if j == 0 else counts_pp)[:] += np.stack([tp, fp, fn], axis=1)
    dice_raw = dice_from_counts(counts_raw[:, 0], counts_raw[:, 1], counts_raw[:, 2])
    dice_pp = dice_from_counts(counts_pp[:, 0], counts_pp[:, 1], counts_pp[:, 2])
    keep = [int(c + 1) for c in range(nc - 1)
            if np.nan_to_num(dice_pp[c]) > np.nan_to_num(dice_raw[c]) + min_gain]
    decision = {
        "for_which_classes": keep,
        "dice_raw": {int(c + 1): float(dice_raw[c]) for c in range(nc - 1)},
        "dice_pp": {int(c + 1): float(dice_pp[c]) for c in range(nc - 1)},
    }
    out_dir = output_folder or trainer.output_folder
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "postprocessing.json"), "w") as f:
        json.dump(decision, f, indent=2)
    return decision


def load_postprocessing(folder: str) -> list | None:
    """Classes to largest-component-filter, or None if no decision file
    (upstream ``load_postprocessing`` counterpart)."""
    p = os.path.join(folder, "postprocessing.json")
    if not os.path.isfile(p):
        return None
    with open(p) as f:
        d = json.load(f)
    return d.get("for_which_classes") or None
