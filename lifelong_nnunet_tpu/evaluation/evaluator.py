"""Evaluator: cross-task patch/window-based metric evaluation of any trained
model.

Counterpart of the reference's ``nnunet_ext/evaluation/evaluator.py:29-330``:
restore the trainer from a checkpoint, pick the head per evaluated task (its
own head, a fixed ``use_head``, or the last head), run the per-subject
validation, and write ``val_metrics_eval.json/csv`` plus
``summarized_val_metrics.{txt,csv}`` (mean±std per task/metric/class) and a
``model_summary.csv`` with parameter counts and model size.
"""

from __future__ import annotations

import csv
import json
import os

import numpy as np

from ..training.restore import restore_trainer
from ..training.trainer import MultiHeadTrainer, TrainerOptions


class Evaluator:
    """Evaluation runs with full TTA mirroring (``mirror_axes=None`` →
    inference default) so its metrics are comparable with evaluator2 and
    ``nnUNet_inference`` outputs.

    Plain single-task base models (``nnUNetTrainerV2`` / ``nnViTUNetTrainer``
    checkpoints) evaluate cross-task WITHOUT the reference's throwaway
    MultiHead-trainer wrap (``evaluator.py:149-190``): every trainer here is
    already a multi-head param partition, and tasks without a matching head
    fall back to the last (only) head inside ``_perform_validation``."""

    def __init__(self, checkpoint_base: str, options: TrainerOptions | None = None):
        self.trainer: MultiHeadTrainer = restore_trainer(checkpoint_base, options)

    def evaluate_on(self, task_stage_dirs: dict, output_folder: str,
                    use_head: str | None = None,
                    always_use_last_head: bool = False,
                    mirror_axes: tuple | None = None) -> dict:
        """task_stage_dirs: {task_name: preprocessed stage dir}.  Evaluates on
        each task's validation split (same fold split as training)."""
        os.makedirs(output_folder, exist_ok=True)
        tr = self.trainer
        for task, stage in task_stage_dirs.items():
            tr.register_task_data(task, stage)
        tr.output_folder = output_folder
        results = tr._perform_validation(list(task_stage_dirs), use_head=use_head,
                                         always_use_last_head=always_use_last_head,
                                         call_for_eval=True,
                                         mirror_axes=mirror_axes)
        self._write_summary(results, output_folder)
        self._write_model_summary(output_folder)
        return results

    # ---------------------------------------------------------------- output
    def _write_summary(self, results: dict, output_folder: str):
        """mean±std per (task, metric, class) — reference evaluator.py:276-330."""
        rows = []
        for task, r in results.items():
            metrics: dict = {}
            for subj, m in r["subjects"].items():
                for metric, vals in m.items():
                    for ci, v in enumerate(vals):
                        metrics.setdefault((metric, ci + 1), []).append(v)
            for (metric, cls), vals in sorted(metrics.items()):
                arr = np.array(vals, dtype=np.float64)
                rows.append({"task": task, "head": r["head"], "metric": metric,
                             "class": cls, "mean": float(np.nanmean(arr)),
                             "std": float(np.nanstd(arr)),
                             "n_subjects": int(np.sum(~np.isnan(arr)))})
        with open(os.path.join(output_folder, "summarized_val_metrics.csv"),
                  "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=["task", "head", "metric", "class",
                                              "mean", "std", "n_subjects"])
            w.writeheader()
            w.writerows(rows)
        with open(os.path.join(output_folder, "summarized_val_metrics.txt"), "w") as f:
            for row in rows:
                f.write(f"{row['task']} (head {row['head']}) {row['metric']} "
                        f"class {row['class']}: {row['mean']:.4f} ± {row['std']:.4f} "
                        f"(n={row['n_subjects']})\n")

    def _write_model_summary(self, output_folder: str):
        """Parameter counts / model size (reference evaluator.py:202-235,
        helpful_functions.py:302-326)."""
        mh = self.trainer.mh
        body_params = sum(int(np.prod(v.shape)) for v in mh.body.values())
        rows = [{"part": "body", "num_params": body_params,
                 "size_mb": round(body_params * 4 / 2 ** 20, 3)}]
        for t, h in mh.heads.items():
            n = sum(int(np.prod(v.shape)) for v in h.values())
            rows.append({"part": f"head:{t}", "num_params": n,
                         "size_mb": round(n * 4 / 2 ** 20, 3)})
        total = body_params + sum(r["num_params"] for r in rows[1:])
        rows.append({"part": "total", "num_params": total,
                     "size_mb": round(total * 4 / 2 ** 20, 3)})
        with open(os.path.join(output_folder, "model_summary.csv"), "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=["part", "num_params", "size_mb"])
            w.writeheader()
            w.writerows(rows)
