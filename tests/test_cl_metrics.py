"""BWT/FWT + accuracy matrix end-to-end, and progress plotting."""

import os

import numpy as np
import pytest

from lifelong_nnunet_tpu.evaluation.cl_metrics import (accuracy_matrix, cl_report,
                                                       write_cl_report)
from lifelong_nnunet_tpu.evaluation.metrics import (backward_transfer,
                                                    forward_transfer)
from lifelong_nnunet_tpu.training.trainer import MultiHeadTrainer, TrainerOptions


def test_bwt_fwt_formulas():
    A = np.array([[0.8, 0.1, 0.0],
                  [0.6, 0.7, 0.2],
                  [0.5, 0.6, 0.9]])
    # BWT = mean((A[2,0]-A[0,0]), (A[2,1]-A[1,1])) = ((-0.3)+(-0.1))/2
    np.testing.assert_allclose(backward_transfer(A), -0.2, atol=1e-9)
    # FWT = mean(A[0,1], A[1,2]) with zero baseline
    np.testing.assert_allclose(forward_transfer(A), 0.15, atol=1e-9)
    assert backward_transfer(A[:1]) == 0.0


def small_opts(**kw):
    d = dict(num_epochs=1, iters_per_epoch=4, val_iters=1, save_every=5,
             batch_size=2, patch_size=(16, 16, 16), augment=False,
             dtype="float32", base_num_features=4, max_num_features=16)
    d.update(kw)
    return TrainerOptions(**d)


def test_accuracy_matrix_and_report(synthetic_task, synthetic_task_b, tmp_path):
    from lifelong_nnunet_tpu.planning.fingerprint import analyze_dataset
    from lifelong_nnunet_tpu.planning.plans import plan_experiment
    from lifelong_nnunet_tpu.planning.preprocess import preprocess_task
    plans = plan_experiment(analyze_dataset(synthetic_task))
    stages = {}
    for td in (synthetic_task, synthetic_task_b):
        name = os.path.basename(td)
        stages[name] = preprocess_task(td, plans, str(tmp_path / "pre"),
                                       configs=("3d_fullres",))["3d_fullres"]
    tasks = list(stages)
    tr = MultiHeadTrainer(plans, "3d_fullres", str(tmp_path / "t0"), small_opts())
    ckpts = []
    for i, t in enumerate(tasks):
        tr.set_output_folder(str(tmp_path / f"t{i}"))
        tr.train_task(t, stages[t])
        ckpts.append(str(tmp_path / f"t{i}" / "model_final_checkpoint"))

    A = accuracy_matrix(ckpts, stages, small_opts())
    assert A.shape == (2, 2)
    assert np.isfinite(A).all()
    report = cl_report(A, tasks)
    assert set(report) >= {"BWT", "FWT", "accuracy_matrix", "final_mean_dice"}
    write_cl_report(report, str(tmp_path / "rep"))
    assert os.path.isfile(tmp_path / "rep" / "cl_metrics.json")
    # progress plot was written during training
    assert os.path.isfile(tmp_path / "t1" / "progress.png")
