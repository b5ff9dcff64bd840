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
from ..utilities.imageio import READABLE_SUFFIXES, image_suffix, read_image


def compute_scores_and_build_dict(pred_folder: str, labels_folder: str,
                                  num_classes: int) -> dict:
    """Per-case per-class Dice/IoU between predicted and GT segmentations
    (reference evaluator2.py:60-109; reads any supported image format like
    the reference's ``sitk.ReadImage`` at :86 — sklearn confusion matrix
    there; direct counting here)."""
    out = {}
    for f in sorted(os.listdir(pred_folder)):
        suf = image_suffix(f)
        if suf is None:
            continue
        case = f[: -len(suf)]
        gt_path = None
        for ext in READABLE_SUFFIXES:
            p = os.path.join(labels_folder, case + ext)
            if os.path.isfile(p):
                gt_path = p
                break
        if gt_path is None:
            continue
        pred = np.asarray(read_image(os.path.join(pred_folder, f)).data).astype(np.int32)
        gt = np.asarray(read_image(gt_path).data).astype(np.int32)
        out[case] = subject_metrics(pred, gt, num_classes)
    return out


def run_evaluation2(checkpoint_base: str, task_raw_dirs: dict, output_folder: str,
                    use_head: str | None = None, do_tta: bool = True,
                    no_delete: bool = False, window_batch: int = 8,
                    fold: int = 0, legacy_structure: bool = False) -> dict:
    """task_raw_dirs: {task_name: raw Decathlon task dir}.  Returns
    {task: {case: {Dice: [...], IoU: [...]}}} and writes json + csv.

    Besides the native ``eval2_metrics.*``, reference-layout outputs are
    written (evaluator2.py:185-240): ``val_metrics_all`` (every case) and
    ``val_metrics_eval`` (only this fold's validation cases, when a
    ``splits_final.json`` exists).  ``legacy_structure=True`` merges all
    evaluated tasks into one json/csv + ``summarized_metrics_*.txt`` at the
    output root (the reference's legacy tree); otherwise each task gets its
    own subfolder, matching the reference's current tree."""
    trainer = restore_trainer(checkpoint_base)
    from ..models.unet import maybe_pallas_conv
    model, plans = maybe_pallas_conv(trainer.model), trainer.plans
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
    write_reference_outputs(all_results, output_folder, fold, legacy_structure,
                            checkpoint_base=checkpoint_base, use_head=use_head)
    return all_results


# ---------------------------------------------------------------------------
# reference-layout outputs (interop with reference evaluation trees)
# ---------------------------------------------------------------------------

def _val_split_cases(task: str, fold: int, cases):
    """This fold's validation case ids: from ``splits_final.json`` under the
    preprocessed root when present, else the same deterministic
    ``kfold_split`` the trainer uses (seed 12345) over the scored cases."""
    from .. import paths
    pre = paths.preprocessed_dir(create=False)
    if pre:
        p = os.path.join(pre, task, "splits_final.json")
        if os.path.isfile(p):
            with open(p) as f:
                splits = json.load(f)
            if splits:
                return set(splits[fold % len(splits)].get("val", []))
    from ..data.dataset import kfold_split
    return set(kfold_split(sorted(cases), fold)[1])


def _reference_nested(all_results: dict, case_filters: dict) -> dict:
    """{task: {case: {'mask_c': {'IoU': x, 'Dice': y}}}} — the reference's
    ``compute_scores_and_build_dict`` shape (evaluator2.py:60-109)."""
    tasks_dict = {}
    for task, r in all_results.items():
        keep = case_filters.get(task)
        cases = {}
        for case, m in r["cases"].items():
            if keep is not None and case not in keep:
                continue
            cases[case] = {
                f"mask_{ci + 1}": {"IoU": m["IoU"][ci], "Dice": m["Dice"][ci]}
                for ci in range(len(m["Dice"]))}
        tasks_dict[task] = cases
    return tasks_dict


def _flat_rows(nested: dict) -> list:
    rows = []
    for epoch, tasks in nested.items():
        for task, cases in tasks.items():
            for case, masks in cases.items():
                for mask, metrics in masks.items():
                    for metric, value in metrics.items():
                        rows.append([epoch, task, case, mask, metric, value])
    return rows


def _dump_reference_files(nested: dict, folder: str, file_name: str):
    import csv
    os.makedirs(folder, exist_ok=True)
    with open(os.path.join(folder, file_name + ".json"), "w") as f:
        json.dump(nested, f, indent=2)
    with open(os.path.join(folder, file_name + ".csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["Epoch", "Task", "subject_id", "seg_mask", "metric", "value"])
        w.writerows(_flat_rows(nested))


def _write_summary_txt(nested: dict, path: str, fold: int,
                       checkpoint_base: str, use_head):
    rows = _flat_rows(nested)
    with open(path, "w") as f:
        f.write(f"Evaluation performed after Epoch XXX, trained on fold {fold}.\n\n")
        f.write(f"The used checkpoint can be found at {checkpoint_base} "
                f"(head: {use_head or 'per-task'}).\n\n")
        tasks = sorted({r[1] for r in rows})
        for task in tasks:
            masks = sorted({r[3] for r in rows if r[1] == task})
            for mask in masks:
                for metric in ("IoU", "Dice"):
                    vals = np.array([r[5] for r in rows
                                     if r[1] == task and r[3] == mask
                                     and r[4] == metric], dtype=np.float64)
                    f.write(f"Evaluation performed for fold {fold}, task {task} "
                            f"using segmentation mask {mask} and {metric} as "
                            f"metric:\n")
                    f.write(f"mean (+/- std):\t {np.nanmean(vals)} +/- "
                            f"{np.nanstd(vals)}\n\n")


def write_reference_outputs(all_results: dict, output_folder: str, fold: int,
                            legacy_structure: bool, checkpoint_base: str = "",
                            use_head=None):
    """Reference evaluator2 output layout (evaluator2.py:185-240): legacy =
    one merged val_metrics_{all,eval}.{json,csv} + summarized_metrics_*.txt;
    otherwise per-task subfolders with the same files."""
    val_filters = {t: _val_split_cases(t, fold, all_results[t]["cases"])
                   for t in all_results}
    for include_all, file_name in ((True, "val_metrics_all"),
                                   (False, "val_metrics_eval")):
        filters = {t: None for t in all_results} if include_all else val_filters
        nested = {"epoch_XXX": _reference_nested(all_results, filters)}
        if legacy_structure:
            _dump_reference_files(nested, output_folder, file_name)
            _write_summary_txt(
                nested, os.path.join(output_folder,
                                     "summarized_metrics_all.txt" if include_all
                                     else "summarized_metrics_val.txt"),
                fold, checkpoint_base, use_head)
        else:
            for task in all_results:
                per_task = {"epoch_XXX": {task: nested["epoch_XXX"][task]}}
                _dump_reference_files(per_task,
                                      os.path.join(output_folder, task), file_name)


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
