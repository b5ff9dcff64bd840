"""evaluator2: "realistic" evaluation through the full inference pipeline.

Counterpart of ``nnunet_ext/evaluation/evaluator2.py:60-240``: for each eval
task, run ``predict_from_folder`` on the raw ``imagesTr`` (full preprocessing
+ sliding window + TTA + resample-back), then score each predicted
segmentation against ``labelsTr`` with per-case/per-class Dice & IoU
(``compute_scores_and_build_dict``).  Supports evaluating a specific
checkpoint (``-chk``) and keeping predictions (``no_delete``).
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np

from ..evaluation.metrics import subject_metrics
from ..inference.predict import predict_from_folder
from ..training.restore import restore_trainer
from ..utilities.nifti import read as nifti_read


def compute_scores_and_build_dict(pred_folder: str, labels_folder: str,
                                  num_classes: int) -> dict:
    """Per-case per-class Dice/IoU between predicted and GT segmentations
    (reference evaluator2.py:60-109, sklearn confusion matrix there; direct
    counting here)."""
    out = {}
    for f in sorted(os.listdir(pred_folder)):
        if not f.endswith((".nii", ".nii.gz")):
            continue
        case = f[:-7] if f.endswith(".nii.gz") else f[:-4]
        gt_path = None
        for ext in (".nii.gz", ".nii"):
            p = os.path.join(labels_folder, case + ext)
            if os.path.isfile(p):
                gt_path = p
                break
        if gt_path is None:
            continue
        pred = np.asarray(nifti_read(os.path.join(pred_folder, f)).data).astype(np.int32)
        gt = np.asarray(nifti_read(gt_path).data).astype(np.int32)
        out[case] = subject_metrics(pred, gt, num_classes)
    return out


def run_evaluation2(checkpoint_base: str, task_raw_dirs: dict, output_folder: str,
                    use_head: str | None = None, do_tta: bool = True,
                    no_delete: bool = False, window_batch: int = 8) -> dict:
    """task_raw_dirs: {task_name: raw Decathlon task dir}.  Returns
    {task: {case: {Dice: [...], IoU: [...]}}} and writes json + csv."""
    trainer = restore_trainer(checkpoint_base)
    model, plans = trainer.model, trainer.plans
    os.makedirs(output_folder, exist_ok=True)
    all_results = {}
    for task, raw_dir in task_raw_dirs.items():
        head = use_head or (task if task in trainer.mh.tasks else trainer.mh.tasks[-1])
        params = trainer.mh.assemble(head)
        apply_fn = lambda p, x: model.apply({"params": p}, x)
        pred_dir = os.path.join(output_folder, f"predictions_{task}")
        predict_from_folder(apply_fn, [params], plans, trainer.config_name,
                            os.path.join(raw_dir, "imagesTr"), pred_dir,
                            do_tta=do_tta, window_batch=window_batch)
        scores = compute_scores_and_build_dict(
            pred_dir, os.path.join(raw_dir, "labelsTr"), trainer.num_classes)
        all_results[task] = {"head": head, "cases": scores}
        if not no_delete:
            shutil.rmtree(pred_dir, ignore_errors=True)
    with open(os.path.join(output_folder, "eval2_metrics.json"), "w") as f:
        json.dump(all_results, f, indent=2)
    _write_csv(all_results, os.path.join(output_folder, "eval2_metrics.csv"))
    return all_results


def _write_csv(results: dict, path: str):
    import csv
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["task", "head", "case", "metric", "class", "value"])
        for task, r in results.items():
            for case, m in r["cases"].items():
                for metric, vals in m.items():
                    for ci, v in enumerate(vals):
                        w.writerow([task, r["head"], case, metric, ci + 1, v])
