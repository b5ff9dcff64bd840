"""First-class continual-learning metrics: accuracy matrix, BWT, FWT.

The reference only advertises BWT/FWT (README.md:7) and computes them in an
offline notebook from eval CSVs (SURVEY.md §5/§6 say the rebuild should make
them library outputs).  Here: evaluate the per-task final checkpoints the
training orchestrator leaves behind, build the [stage x task] Dice matrix,
and derive BWT/FWT (Lopez-Paz & Ranzato, GEM).
"""

from __future__ import annotations

import json
import os

import numpy as np

from .metrics import backward_transfer, forward_transfer


def mean_dice_of(results: dict, task: str) -> float:
    subj = results[task]["subjects"]
    vals = [np.nanmean(m["Dice"]) for m in subj.values()]
    return float(np.nanmean(vals)) if vals else float("nan")


def accuracy_matrix(per_stage_checkpoints: list, task_stage_dirs: dict,
                    options=None) -> np.ndarray:
    """per_stage_checkpoints: checkpoint base path of the model AFTER training
    stage t (ordered).  Evaluates every checkpoint on every task's val split.
    Returns matrix A[t, i] = mean Dice on task i after stage t."""
    from .evaluator import Evaluator
    tasks = list(task_stage_dirs)
    A = np.full((len(per_stage_checkpoints), len(tasks)), np.nan)
    for t, ckpt in enumerate(per_stage_checkpoints):
        ev = Evaluator(ckpt, options)
        import tempfile
        with tempfile.TemporaryDirectory() as tmp:
            res = ev.evaluate_on(task_stage_dirs, tmp)
        for i, task in enumerate(tasks):
            if task in res:
                A[t, i] = mean_dice_of(res, task)
    return A


def cl_report(A: np.ndarray, tasks: list, baseline: np.ndarray | None = None) -> dict:
    report = {
        "tasks": list(tasks),
        "accuracy_matrix": A.tolist(),
        "final_mean_dice": float(np.nanmean(A[-1])),
        "BWT": backward_transfer(A),
        "FWT": forward_transfer(A, baseline),
    }
    return report


def write_cl_report(report: dict, output_folder: str):
    os.makedirs(output_folder, exist_ok=True)
    with open(os.path.join(output_folder, "cl_metrics.json"), "w") as f:
        json.dump(report, f, indent=2)
