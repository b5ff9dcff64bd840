"""M6 end-to-end CLI tests: plan_and_preprocess → train (sequential, 2 tasks)
→ resume no-op → evaluate → inference → evaluator2 → restore — the analog of
the reference's heavyweight trainer test (SURVEY.md §4) on synthetic data."""

import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def env_roots(tmp_path_factory, synthetic_task, synthetic_task_b, monkeypatch=None):
    root = tmp_path_factory.mktemp("roots")
    import shutil
    raw = root / "raw" / "nnUNet_raw_data"
    raw.mkdir(parents=True)
    for td in (synthetic_task, synthetic_task_b):
        shutil.copytree(td, raw / os.path.basename(td))
    env = {
        "nnUNet_raw_data_base": str(root / "raw"),
        "nnUNet_preprocessed": str(root / "pre"),
        "RESULTS_FOLDER": str(root / "results"),
        "EVALUATION_FOLDER": str(root / "eval"),
        "PARAM_SEARCH_FOLDER": str(root / "ps"),
    }
    old = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    yield root
    for k, v in old.items():
        if v is None:
            os.environ.pop(k, None)
        else:
            os.environ[k] = v


TINY = ["-num_epochs", "1", "-num_iters", "4", "-val_iters", "1",
        "-patch_size", "16", "16", "16", "-batch_size", "2",
        "-base_features", "4", "-max_features", "16", "--no_augment", "--fp32"]


@pytest.fixture(scope="module")
def preprocessed(env_roots):
    from lifelong_nnunet_tpu.run.plan_and_preprocess import main as pap_main
    import sys
    argv = sys.argv
    sys.argv = ["nnUNet_plan_and_preprocess", "-t", "97", "98",
                "-pl", "3d_fullres"]
    try:
        pap_main()
    finally:
        sys.argv = argv
    return env_roots


@pytest.fixture(scope="module")
def trained(preprocessed):
    from lifelong_nnunet_tpu.run.run_training import run_training
    run_training("sequential", ["3d_fullres", "-t", "97", "98", "-f", "0"] + TINY)
    return preprocessed


def test_plan_and_preprocess_cli(preprocessed):
    pre = preprocessed / "pre"
    for task in ("Task097_SynthA", "Task098_SynthB"):
        assert (pre / task / "nnUNetPlansv2.1_plans.json").is_file()
        stage = pre / task / "nnUNetData_plans_v2.1_3d_fullres"
        assert len(list(stage.glob("*.npy"))) == 6


def test_training_cli_output_tree(trained):
    results = trained / "results" / "nnUNet_ext" / "3d_fullres"
    seq = results / "Task097_SynthA_Task098_SynthB"
    # per-task output dirs exist with final checkpoints
    d1 = (seq / "Task097_SynthA" / "nnUNetTrainerSequential__nnUNetPlansv2.1"
          / "Generic_UNet" / "SEQ" / "fold_0")
    d2 = (seq / "Task097_SynthA_Task098_SynthB"
          / "nnUNetTrainerSequential__nnUNetPlansv2.1" / "Generic_UNet" / "SEQ"
          / "fold_0")
    assert (d1 / "model_final_checkpoint.ckpt").is_file()
    assert (d2 / "model_final_checkpoint.ckpt").is_file()
    # manifest in metadata tree
    meta = (seq / "metadata" / "nnUNetTrainerSequential__nnUNetPlansv2.1"
            / "Generic_UNet" / "SEQ" / "sequential_trained_on.json")
    assert meta.is_file()
    with open(meta) as f:
        m = json.load(f)["0"]
    assert m["finished_training_on"] == ["Task097_SynthA", "Task098_SynthB"]


def test_training_cli_resume_noop(trained, capsys):
    """-c with everything finished must not retrain (no new epochs)."""
    from lifelong_nnunet_tpu.run.run_training import run_training
    run_training("sequential",
                 ["3d_fullres", "-t", "97", "98", "-f", "0", "-c"] + TINY)
    out = capsys.readouterr().out
    assert "finished Task" not in out  # no task retrained


def test_restore_trainer(trained):
    from lifelong_nnunet_tpu.training.restore import restore_trainer
    d2 = (trained / "results" / "nnUNet_ext" / "3d_fullres"
          / "Task097_SynthA_Task098_SynthB" / "Task097_SynthA_Task098_SynthB"
          / "nnUNetTrainerSequential__nnUNetPlansv2.1" / "Generic_UNet" / "SEQ"
          / "fold_0")
    tr = restore_trainer(str(d2 / "model_final_checkpoint"))
    assert tr.mh.tasks == ["Task097_SynthA", "Task098_SynthB"]
    assert type(tr).__name__ == "SequentialTrainer"
    assert tr.model.base_num_features == 4


def test_evaluation_cli(trained):
    from lifelong_nnunet_tpu.run.run_evaluation import run_evaluation
    run_evaluation(["3d_fullres", "sequential",
                    "-trained_on", "Task097_SynthA", "Task098_SynthB",
                    "-evaluate_on", "97", "98", "-f", "0"])
    eval_root = trained / "eval" / "nnUNet_ext"
    csvs = list(eval_root.rglob("summarized_val_metrics.csv"))
    assert csvs, "no evaluation summary written"
    txt = csvs[0].with_suffix(".txt")
    assert txt.exists()
    models = list(eval_root.rglob("model_summary.csv"))
    assert models


def test_inference_cli(trained, tmp_path):
    from lifelong_nnunet_tpu.run.run_inference import run_inference
    inp = str(trained / "raw" / "nnUNet_raw_data" / "Task097_SynthA" / "imagesTr")
    out = str(tmp_path / "preds")
    run_inference(["3d_fullres", "sequential", "-i", inp, "-o", out,
                   "-trained_on", "Task097_SynthA", "Task098_SynthB",
                   "-f", "0", "--disable_tta"])
    from lifelong_nnunet_tpu.utilities.nifti import read
    preds = sorted(os.listdir(out))
    assert len(preds) == 6
    seg = np.asarray(read(os.path.join(out, preds[0])).data)
    assert seg.shape == (28, 36, 28)  # original volume geometry restored
    assert set(np.unique(seg)).issubset({0, 1, 2})


def test_evaluator2(trained, tmp_path):
    from lifelong_nnunet_tpu.evaluation.evaluator2 import run_evaluation2
    d2 = (trained / "results" / "nnUNet_ext" / "3d_fullres"
          / "Task097_SynthA_Task098_SynthB" / "Task097_SynthA_Task098_SynthB"
          / "nnUNetTrainerSequential__nnUNetPlansv2.1" / "Generic_UNet" / "SEQ"
          / "fold_0")
    raw = trained / "raw" / "nnUNet_raw_data"
    res = run_evaluation2(str(d2 / "model_final_checkpoint"),
                          {"Task097_SynthA": str(raw / "Task097_SynthA")},
                          str(tmp_path / "e2"), do_tta=False)
    cases = res["Task097_SynthA"]["cases"]
    assert len(cases) == 6
    for m in cases.values():
        assert len(m["Dice"]) == 2
    assert (tmp_path / "e2" / "eval2_metrics.csv").is_file()
    # reference (non-legacy) layout: per-task subfolder with val_metrics files
    sub = tmp_path / "e2" / "Task097_SynthA"
    assert (sub / "val_metrics_all.json").is_file()
    assert (sub / "val_metrics_eval.csv").is_file()
    import json as _json
    with open(sub / "val_metrics_all.json") as f:
        nested = _json.load(f)
    all_cases = nested["epoch_XXX"]["Task097_SynthA"]
    assert len(all_cases) == 6
    case0 = next(iter(all_cases.values()))
    assert set(case0) == {"mask_1", "mask_2"}
    assert set(case0["mask_1"]) == {"IoU", "Dice"}
    # val_metrics_eval keeps only this fold's validation split
    with open(sub / "val_metrics_eval.json") as f:
        eval_cases = _json.load(f)["epoch_XXX"]["Task097_SynthA"]
    assert 0 < len(eval_cases) < len(all_cases)
    assert set(eval_cases).issubset(set(all_cases))


def test_evaluator2_legacy_structure(trained, tmp_path):
    """--legacy_structure merges all tasks into one val_metrics json/csv +
    summarized_metrics txt at the output root (reference evaluator2 legacy
    tree, evaluator2.py:185-220)."""
    from lifelong_nnunet_tpu.evaluation.evaluator2 import run_evaluation2
    d2 = (trained / "results" / "nnUNet_ext" / "3d_fullres"
          / "Task097_SynthA_Task098_SynthB" / "Task097_SynthA_Task098_SynthB"
          / "nnUNetTrainerSequential__nnUNetPlansv2.1" / "Generic_UNet" / "SEQ"
          / "fold_0")
    raw = trained / "raw" / "nnUNet_raw_data"
    run_evaluation2(str(d2 / "model_final_checkpoint"),
                    {"Task097_SynthA": str(raw / "Task097_SynthA"),
                     "Task098_SynthB": str(raw / "Task098_SynthB")},
                    str(tmp_path / "leg"), do_tta=False, legacy_structure=True)
    import json as _json
    root = tmp_path / "leg"
    with open(root / "val_metrics_all.json") as f:
        nested = _json.load(f)["epoch_XXX"]
    assert set(nested) == {"Task097_SynthA", "Task098_SynthB"}
    assert (root / "val_metrics_eval.csv").is_file()
    summary = (root / "summarized_metrics_val.txt").read_text()
    assert "mean (+/- std)" in summary and "Task098_SynthB" in summary


def test_2d_training_pipeline(preprocessed):
    """The 2d configuration end-to-end: preprocess (2d stage), train, eval."""
    from lifelong_nnunet_tpu.run.plan_and_preprocess import plan_and_preprocess
    from lifelong_nnunet_tpu.run.run_training import run_training
    import lifelong_nnunet_tpu.paths as paths
    raw = paths.raw_data_dir()
    pre = paths.preprocessed_dir()
    plan_and_preprocess([os.path.join(raw, "Task097_SynthA")], pre,
                        configs=("2d",), verbose=False)
    run_training("sequential",
                 ["2d", "-t", "97", "-f", "0", "-num_epochs", "1",
                  "-num_iters", "4", "-val_iters", "1",
                  "-patch_size", "16", "16", "-batch_size", "4",
                  "-base_features", "4", "-max_features", "16",
                  "--no_augment", "--fp32"])
    results = paths.results_dir()
    d = os.path.join(results, "2d", "Task097_SynthA", "Task097_SynthA",
                     "nnUNetTrainerSequential__nnUNetPlansv2.1",
                     "Generic_UNet", "SEQ", "fold_0")
    assert os.path.isfile(os.path.join(d, "model_final_checkpoint.ckpt"))


def test_init_seq_from_pretrained(trained, tmp_path):
    """--init_seq: start a new sequence from an existing trained model."""
    from lifelong_nnunet_tpu.run.run_training import run_training
    import lifelong_nnunet_tpu.paths as paths
    results = paths.results_dir()
    prev = os.path.join(results, "3d_fullres", "Task097_SynthA_Task098_SynthB",
                        "Task097_SynthA",
                        "nnUNetTrainerSequential__nnUNetPlansv2.1",
                        "Generic_UNet", "SEQ", "fold_0",
                        "model_final_checkpoint")
    run_training("multihead",
                 ["3d_fullres", "-t", "98", "-f", "0", "--init_seq",
                  "-initialize_with_network_trainer", prev] + TINY)
    d = os.path.join(results, "3d_fullres", "Task098_SynthB", "Task098_SynthB",
                     "nnUNetTrainerMultiHead__nnUNetPlansv2.1",
                     "Generic_UNet", "MH", "fold_0")
    assert os.path.isfile(os.path.join(d, "model_final_checkpoint.ckpt"))
    from lifelong_nnunet_tpu.training.restore import restore_trainer
    tr = restore_trainer(os.path.join(d, "model_final_checkpoint"))
    # both the original task's head and the new task's head exist
    assert set(tr.mh.tasks) == {"Task097_SynthA", "Task098_SynthB"}


def test_multi_fold_ensemble_inference(trained, tmp_path):
    from lifelong_nnunet_tpu.run.run_training import run_training
    from lifelong_nnunet_tpu.run.run_inference import run_inference
    # train fold 1 as well (fold 0 exists from the `trained` fixture)
    run_training("sequential", ["3d_fullres", "-t", "97", "98", "-f", "1"] + TINY)
    inp = str(trained / "raw" / "nnUNet_raw_data" / "Task097_SynthA" / "imagesTr")
    out = str(tmp_path / "ens")
    run_inference(["3d_fullres", "sequential", "-i", inp, "-o", out,
                   "-trained_on", "Task097_SynthA", "Task098_SynthB",
                   "-f", "0", "1", "--disable_tta"])
    assert len(os.listdir(out)) == 6


def test_mid_task_resume(preprocessed, capsys):
    """Interrupted-task continuation: -c resumes from model_latest with the
    saved epoch and optimizer state."""
    import json as _json
    from lifelong_nnunet_tpu.run.run_training import run_training
    import lifelong_nnunet_tpu.paths as paths
    args = ["3d_fullres", "-t", "97", "-f", "0", "-num_epochs", "2",
            "-num_iters", "2", "-val_iters", "1", "-save_interval", "1",
            "-patch_size", "16", "16", "16", "-batch_size", "2",
            "-base_features", "4", "-max_features", "16", "--no_augment",
            "--fp32"]
    run_training("ewc", args)
    results = paths.results_dir()
    meta = os.path.join(results, "3d_fullres", "Task097_SynthA", "metadata",
                        "nnUNetTrainerEWC__nnUNetPlansv2.1", "Generic_UNet",
                        "MH", "ewc_trained_on.json")
    # simulate an interruption: pretend the task never finished
    with open(meta) as f:
        m = _json.load(f)
    m["0"]["finished_training_on"] = []
    m["0"]["start_training_on"] = "Task097_SynthA"
    with open(meta, "w") as f:
        _json.dump(m, f)
    capsys.readouterr()
    run_training("ewc", args[:5] + ["-num_epochs", "4"] + args[7:] + ["-c"])
    out = capsys.readouterr().out
    assert "resuming Task097_SynthA at epoch 2" in out
    d = os.path.join(results, "3d_fullres", "Task097_SynthA", "Task097_SynthA",
                     "nnUNetTrainerEWC__nnUNetPlansv2.1", "Generic_UNet", "MH",
                     "fold_0")
    with open(os.path.join(d, "model_final_checkpoint.json")) as f:
        man = _json.load(f)
    assert man["epoch"] == 3  # trained epochs 2..3 after resume


def test_evaluate_initialization(trained, tmp_path):
    """evaluator2 on the before_training checkpoint (the model as it was
    BEFORE the last task's training) — reference -evaluate_initialization."""
    from lifelong_nnunet_tpu.run.run_evaluation import run_evaluation2_cli
    run_evaluation2_cli(["3d_fullres", "sequential",
                         "-trained_on", "Task097_SynthA", "Task098_SynthB",
                         "-evaluate_on", "97", "-f", "0",
                         "--evaluate_initialization", "--disable_tta",
                         "--no_delete"])
    eval_root = trained / "eval" / "nnUNet_ext"
    found = list(eval_root.rglob("eval2_metrics.json"))
    assert found
    import json as _json
    with open(found[0]) as f:
        res = _json.load(f)
    assert "Task097_SynthA" in res


def test_base_model_train_and_cross_task_eval(preprocessed):
    """Plain single-task base model (reference nnUNetTrainerV2): train via
    nnUNet_train_vit -trainer_class nnUNetTrainerV2, then evaluate it
    CROSS-TASK with nnUNet_evaluate (the reference wraps such models in a
    throwaway MultiHead trainer, evaluator.py:149-190; here the fallback to
    the only head serves both tasks)."""
    from lifelong_nnunet_tpu.run.run_training_vit import main as vit_main
    from lifelong_nnunet_tpu.run.run_evaluation import run_evaluation
    vit_main(["3d_fullres", "97", "0", "-trainer_class", "nnUNetTrainerV2"] + TINY)
    results = preprocessed / "results" / "nnUNet_ext" / "3d_fullres"
    d = (results / "Task097_SynthA" / "nnUNetTrainerV2__nnUNetPlansv2.1"
         / "Generic_UNet" / "fold_0")
    assert (d / "model_final_checkpoint.ckpt").is_file()
    run_evaluation(["3d_fullres", "nnUNetTrainerV2",
                    "-trained_on", "Task097_SynthA",
                    "-evaluate_on", "97", "98", "-f", "0"])
    eval_dir = (preprocessed / "eval" / "nnUNet_ext" / "3d_fullres"
                / "Task097_SynthA" / "nnUNetTrainerV2__nnUNetPlansv2.1"
                / "Generic_UNet" / "fold_0")
    assert (eval_dir / "summarized_val_metrics.csv").is_file()
    with open(eval_dir / "val_metrics_eval.json") as f:
        res = json.load(f)[0]["results"]
    assert set(res) == {"Task097_SynthA", "Task098_SynthB"}
    # both tasks evaluated with the base model's single head
    assert res["Task098_SynthB"]["head"] == "Task097_SynthA"
