"""M7: ViT-backbone trainer integration — frozen_vit / ewc_ln now have a real
ViT to act on; task-specific LN lifecycle across tasks."""

import numpy as np
import pytest

from lifelong_nnunet_tpu.models.multihead import flatten
from lifelong_nnunet_tpu.training.trainer import MultiHeadTrainer, TrainerOptions
from lifelong_nnunet_tpu.training.trainers import (EWCLNTrainer,
                                                   FrozenViTTrainer)


def vit_opts(**kw):
    defaults = dict(num_epochs=1, iters_per_epoch=2, val_iters=1, save_every=5,
                    batch_size=2, patch_size=(16, 16, 16), augment=False,
                    dtype="float32", base_num_features=4, max_num_features=16,
                    use_vit=True, vit_depth_override=1)
    defaults.update(kw)
    return TrainerOptions(**defaults)


@pytest.fixture(scope="module")
def two_tasks(synthetic_task, synthetic_task_b, tmp_path_factory):
    import os
    from lifelong_nnunet_tpu.planning.fingerprint import analyze_dataset
    from lifelong_nnunet_tpu.planning.plans import plan_experiment
    from lifelong_nnunet_tpu.planning.preprocess import preprocess_task
    pre = tmp_path_factory.mktemp("previt")
    plans = plan_experiment(analyze_dataset(synthetic_task))
    out = {}
    for td in (synthetic_task, synthetic_task_b):
        out[os.path.basename(td)] = preprocess_task(
            td, plans, str(pre), configs=("3d_fullres",))["3d_fullres"]
    return plans, out


TASKS = ("Task097_SynthA", "Task098_SynthB")


def test_vit_backbone_trains(two_tasks, tmp_path):
    plans, stages = two_tasks
    tr = MultiHeadTrainer(plans, "3d_fullres", str(tmp_path / "r"), vit_opts())
    tr.train_task(TASKS[0], stages[TASKS[0]])
    assert any(k.startswith("vit/") for k in tr.mh.body)
    # batch halving applied (plans batch >= 2 -> halved but >= 1)
    assert tr.batch_size >= 1


def test_frozen_vit_freezes_vit_params(two_tasks, tmp_path):
    plans, stages = two_tasks
    tr = FrozenViTTrainer(plans, "3d_fullres", str(tmp_path / "r"), vit_opts())
    tr.train_task(TASKS[0], stages[TASKS[0]])
    vit0 = {k: np.asarray(v).copy() for k, v in tr.mh.body.items()
            if k.startswith("vit/")}
    enc0 = {k: np.asarray(v).copy() for k, v in tr.mh.body.items()
            if k.startswith("enc0/")}
    tr.train_task(TASKS[1], stages[TASKS[1]])
    for k, v in vit0.items():
        np.testing.assert_array_equal(tr.mh.body[k], v, err_msg=k)
    assert any(not np.allclose(tr.mh.body[k], enc0[k]) for k in enc0)


def test_ewc_ln_fisher_restricted_to_vit_norms(two_tasks, tmp_path):
    plans, stages = two_tasks
    tr = EWCLNTrainer(plans, "3d_fullres", str(tmp_path / "r"), vit_opts())
    tr.train_task(TASKS[0], stages[TASKS[0]])
    keys = list(tr.cl_state["ewc_tasks"][TASKS[0]]["fisher"].keys())
    assert keys, "no fisher entries"
    assert all("vit" in k.lower() and "norm" in k.lower() for k in keys)


def test_task_specific_lns_lifecycle(two_tasks, tmp_path):
    plans, stages = two_tasks
    tr = MultiHeadTrainer(plans, "3d_fullres", str(tmp_path / "r"),
                          vit_opts(vit_task_specific_ln=True))
    tr.train_task(TASKS[0], stages[TASKS[0]])
    assert any(f"ln_{TASKS[0]}" in k for k in tr.mh.body)
    tr.train_task(TASKS[1], stages[TASKS[1]])
    assert any(f"ln_{TASKS[1]}" in k for k in tr.mh.body)
    assert tr.model.ln_tasks == TASKS
    assert tr.model.active_task_idx == 1
