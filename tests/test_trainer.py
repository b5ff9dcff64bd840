"""M3 integration tests: trainer lifecycle, checkpoints/restore, multi-task
sequences — the small-scale analog of the reference's
``test/training/network_training/test_multi_head_trainer.py`` matrix."""

import json
import os

import numpy as np
import jax
import pytest

from lifelong_nnunet_tpu.models.multihead import flatten
from lifelong_nnunet_tpu.training.trainer import MultiHeadTrainer, TrainerOptions
from lifelong_nnunet_tpu.training.trainers import (RehearsalTrainer,
                                                   SequentialTrainer, get_trainer)


def small_opts(**kw):
    defaults = dict(num_epochs=2, iters_per_epoch=4, val_iters=2, save_every=1,
                    batch_size=2, patch_size=(16, 16, 16), augment=False,
                    use_progress_val=False, dtype="float32",
                    base_num_features=4, max_num_features=16)
    defaults.update(kw)
    return TrainerOptions(**defaults)


@pytest.fixture(scope="module")
def two_tasks(synthetic_task, synthetic_task_b, tmp_path_factory):
    from lifelong_nnunet_tpu.planning.fingerprint import analyze_dataset
    from lifelong_nnunet_tpu.planning.plans import plan_experiment
    from lifelong_nnunet_tpu.planning.preprocess import preprocess_task
    pre = tmp_path_factory.mktemp("pre2")
    out = {}
    plans = None
    for task_dir in (synthetic_task, synthetic_task_b):
        fp = analyze_dataset(task_dir)
        p = plan_experiment(fp)
        if plans is None:
            plans = p  # reference invariant: first task's geometry rules
        stage = preprocess_task(task_dir, plans, str(pre), configs=("3d_fullres",))
        out[os.path.basename(task_dir)] = stage["3d_fullres"]
    return plans, out


def equal_params(a, b) -> bool:
    fa, fb = flatten(a), flatten(b)
    return set(fa) == set(fb) and all(np.allclose(fa[k], fb[k]) for k in fa)


def test_single_task_training(two_tasks, tmp_path):
    plans, stages = two_tasks
    task = "Task097_SynthA"
    tr = MultiHeadTrainer(plans, "3d_fullres", str(tmp_path / "run"), small_opts())
    tr.train_task(task, stages[task])
    assert tr.mh.tasks == [task]
    # manifest written
    with open(tr._trained_on_path()) as f:
        m = json.load(f)["0"]
    assert m["finished_training_on"] == [task]
    assert m["checkpoint_should_exist"]
    # checkpoints exist
    for name in ("model_final_checkpoint", "model_latest", "model_best"):
        assert os.path.isfile(os.path.join(tr.output_folder, name + ".ckpt")), name


def test_checkpoint_restore_equality(two_tasks, tmp_path):
    plans, stages = two_tasks
    task = "Task097_SynthA"
    tr = MultiHeadTrainer(plans, "3d_fullres", str(tmp_path / "run"), small_opts())
    tr.train_task(task, stages[task])
    tr2 = MultiHeadTrainer(plans, "3d_fullres", str(tmp_path / "run"), small_opts())
    manifest = tr2.load_checkpoint("model_final_checkpoint")
    assert manifest["trainer"] == "MultiHeadTrainer"
    assert tr2.mh.tasks == [task]
    assert equal_params(tr.mh.assemble(task), tr2.mh.assemble(task))


def test_multihead_two_tasks_preserves_first_head(two_tasks, tmp_path):
    plans, stages = two_tasks
    tA, tB = "Task097_SynthA", "Task098_SynthB"
    tr = MultiHeadTrainer(plans, "3d_fullres", str(tmp_path / "run"), small_opts())
    tr.train_task(tA, stages[tA])
    headA = {k: np.asarray(v).copy() for k, v in tr.mh.heads[tA].items()}
    tr.train_task(tB, stages[tB])
    assert tr.mh.tasks == [tA, tB]
    # Multi-Head: task A's head untouched by task B training
    for k, v in tr.mh.heads[tA].items():
        np.testing.assert_array_equal(v, headA[k])
    # B's head started from init, so differs from A's trained head. Compare
    # the FULL-RES seg head (highest index) — coarser heads may carry zero
    # deep-supervision weight and thus never train.
    top = max(k.split("/")[0] for k in headA if k.startswith("seg"))
    k0 = f"{top}/kernel"
    assert not np.allclose(tr.mh.heads[tB][k0], headA[k0])


def test_sequential_transfers_head(two_tasks, tmp_path):
    plans, stages = two_tasks
    tA, tB = "Task097_SynthA", "Task098_SynthB"
    tr = SequentialTrainer(plans, "3d_fullres", str(tmp_path / "run"), small_opts())
    tr.train_task(tA, stages[tA], num_epochs=1)
    headA = {k: np.asarray(v).copy() for k, v in tr.mh.heads[tA].items()}
    # new task's head must START from A's trained head, not init
    tr.register_task_data(tB, stages[tB])
    mh2 = tr.mh.add_new_task(tB, use_init=not tr.TRANSFER_HEADS)
    k0 = next(iter(headA))
    np.testing.assert_array_equal(mh2.heads[tB][k0], headA[k0])


def test_rehearsal_pool_mixes_tasks(two_tasks, tmp_path):
    plans, stages = two_tasks
    tA, tB = "Task097_SynthA", "Task098_SynthB"
    tr = RehearsalTrainer(plans, "3d_fullres", str(tmp_path / "run"),
                          small_opts(), samples_in_perc=0.5)
    tr.register_task_data(tA, stages[tA])
    tr.register_task_data(tB, stages[tB])
    sampler = tr._make_sampler(tB, train=True)
    dsA = tr._datasets[tA][0]
    n_prev = sum(1 for ds, c in sampler.items if ds is dsA)
    n_cur = sum(1 for ds, c in sampler.items if ds is not dsA)
    assert n_cur == len(tr._datasets[tB][1])
    assert n_prev == max(1, round(0.5 * len(tr._datasets[tA][1])))
    # val sampler stays current-task
    vs = tr._make_sampler(tB, train=False)
    assert all(ds is not dsA for ds, c in vs.items)


def test_perform_validation_writes_metrics(two_tasks, tmp_path):
    plans, stages = two_tasks
    task = "Task097_SynthA"
    tr = MultiHeadTrainer(plans, "3d_fullres", str(tmp_path / "run"), small_opts())
    tr.train_task(task, stages[task], num_epochs=1)
    res = tr._perform_validation()
    assert task in res
    subjects = res[task]["subjects"]
    assert len(subjects) >= 1
    for s, m in subjects.items():
        assert len(m["Dice"]) == 2  # two fg classes
    assert os.path.isfile(os.path.join(tr.output_folder, "val_metrics.json"))
    assert os.path.isfile(os.path.join(tr.output_folder, "val_metrics.csv"))


def test_registry():
    assert get_trainer("sequential") is SequentialTrainer
    assert get_trainer("nnUNetTrainerRehearsal") is RehearsalTrainer
    with pytest.raises(KeyError):
        get_trainer("nope")


def test_data_parallel_mesh_training(two_tasks, tmp_path):
    """8-way data-parallel SPMD training on the virtual CPU mesh."""
    plans, stages = two_tasks
    task = "Task097_SynthA"
    tr = MultiHeadTrainer(plans, "3d_fullres", str(tmp_path / "dp"),
                          small_opts(batch_size=8))
    tr.opts.n_devices = 8
    tr.train_task(task, stages[task], num_epochs=1)
    assert tr.batch_size % 8 == 0
    # params still assemble and validate after sharded training
    res = tr._perform_validation()
    assert task in res


@pytest.mark.parametrize("ext,kw", [("ewc", {"ewc_lambda": 0.3}),
                                    ("rw", {}), ("mib", {}),
                                    ("rehearsal", {}), ("plop", {})])
def test_restore_roundtrip_all_methods(two_tasks, tmp_path, ext, kw):
    """Every CL trainer restores from its checkpoint into the same class with
    identical assembled params (reference restore matrix, SURVEY.md §4)."""
    from lifelong_nnunet_tpu.training.restore import restore_trainer
    from lifelong_nnunet_tpu.training.trainers import get_trainer
    plans, stages = two_tasks
    task = "Task097_SynthA"
    cls = get_trainer(ext)
    tr = cls(plans, "3d_fullres", str(tmp_path / ext), small_opts(), **kw)
    tr.train_task(task, stages[task], num_epochs=1)
    tr2 = restore_trainer(str(tmp_path / ext / "model_final_checkpoint"))
    assert type(tr2) is cls
    assert equal_params(tr.mh.assemble(task), tr2.mh.assemble(task))
    for k, v in tr.hyperparams.items():
        assert str(tr2.hyperparams.get(k)) == str(v)


def test_model_parallel_training_matches_single_device(two_tasks, tmp_path):
    """2-axis mesh (data=4 x model=2): sharding is a LAYOUT choice, so
    training must produce numerically equal params to single-device (within
    float tolerance) given identical batches (reference split_gpu analog,
    generic_ViT_UNet.py:239-257)."""
    plans, stages = two_tasks
    task = "Task097_SynthA"
    runs = {}
    for name, extra in [("single", {}),
                        ("sharded", {"n_devices": 8, "model_parallel": 2})]:
        opts = small_opts(num_epochs=1, iters_per_epoch=3, batch_size=4, **extra)
        tr = MultiHeadTrainer(plans, "3d_fullres", str(tmp_path / name), opts)
        tr.train_task(task, stages[task], num_epochs=1)
        runs[name] = jax.tree.map(np.asarray, tr.mh.assemble(task))
    flat_a, flat_b = (jax.tree.leaves(runs["single"]), jax.tree.leaves(runs["sharded"]))
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(a, b, atol=5e-5, rtol=1e-4)


def test_model_parallel_halves_per_device_param_bytes(two_tasks, tmp_path):
    """The 'model' mesh axis must actually shard large kernels: per-device
    parameter bytes under data=4 x model=2 are ~half of pure data-parallel
    (the HBM headroom that replaces the reference's 2-GPU ViT split)."""
    plans, stages = two_tasks
    task = "Task097_SynthA"

    def per_device_param_bytes(mp):
        opts = small_opts(num_epochs=1, iters_per_epoch=1, batch_size=4,
                          n_devices=8, model_parallel=mp,
                          base_num_features=16, max_num_features=64)
        tr = MultiHeadTrainer(plans, "3d_fullres", str(tmp_path / f"mp{mp}"),
                              opts)
        tr.register_task_data(task, stages[task])
        tr._ensure_initialized(task)
        tr.mh = tr.mh.add_new_task(task)
        tr._build_step()
        total = 0
        for leaf in jax.tree.leaves(tr.state.params):
            shard = leaf.addressable_shards[0].data
            total += shard.size * shard.dtype.itemsize
        return total

    dp_only = per_device_param_bytes(1)
    sharded = per_device_param_bytes(2)
    # conv kernels dominate the byte count; biases/norms stay replicated
    assert sharded < 0.62 * dp_only, (sharded, dp_only)


def test_patch_based_progress_validation(two_tasks, tmp_path):
    """val_mode='patches': the reference's patch-sampled periodic validation
    (multihead/nnUNetTrainerMultiHead.py:678-901) — per-subject Dice/IoU
    accumulated over random val patches, written to val_metrics.json."""
    import json
    import os
    from lifelong_nnunet_tpu.training.trainers import SequentialTrainer

    plans, stages = two_tasks
    opts = small_opts(val_mode="patches", val_iters=3, use_progress_val=False)
    tr = SequentialTrainer(plans, "3d_fullres", str(tmp_path / "pv"), opts)
    tr.train_task("Task097_SynthA", stages["Task097_SynthA"])
    res = tr._perform_validation(tag="patchmode")
    assert "Task097_SynthA" in res
    subjects = res["Task097_SynthA"]["subjects"]
    assert subjects, "no subjects accumulated"
    for case, m in subjects.items():
        assert len(m["dice"]) == tr.num_classes - 1
        assert all(0.0 <= v <= 1.0 for v in m["dice"])
        assert all(0.0 <= v <= 1.0 for v in m["iou"])
    assert os.path.isfile(os.path.join(tr.output_folder, "val_metrics.json"))
    with open(os.path.join(tr.output_folder, "val_metrics.json")) as f:
        hist = json.load(f)
    assert hist[-1]["tag"] == "patchmode"
    # eval calls stay sliding-window (full-volume metrics) regardless
    res_eval = tr._perform_validation(call_for_eval=True)
    assert "Task097_SynthA" in res_eval
