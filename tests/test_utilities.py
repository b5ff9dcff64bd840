"""Utilities coverage: helpful_functions parity helpers, logger, prefetcher."""

import os
import sys

import numpy as np

from lifelong_nnunet_tpu.utilities import helpful_functions as hf


def test_join_texts_with_char():
    assert hf.join_texts_with_char(["a", "b", "c"]) == "a_b_c"
    assert hf.join_texts_with_char([1, 2], "-") == "1-2"


def test_commdiv():
    assert hf.commDiv(40, 56) == [1, 2, 4, 8]
    assert hf.commDiv(7, 5) == [1]


def test_flatten_nested_dict_and_dataframe(tmp_path):
    d = {"a": {"x": 1, "y": 2}, "b": {"x": 3}}
    flat = hf.flatten_nested_dict(d)
    assert flat == {("a", "x"): 1, ("a", "y"): 2, ("b", "x"): 3}
    df = hf.nested_dict_to_dataframe(d, level_names=["grp", "key"])
    assert len(df) == 3
    out = hf.dumpDataFrameToCsv(df, str(tmp_path), "t.csv")
    assert os.path.isfile(out)


def test_param_counting():
    params = {"a": np.zeros((3, 4)), "b": {"c": np.zeros(5)}}
    assert hf.get_nr_parameters(params) == 17
    assert abs(hf.get_model_size(params) - 17 * 4 / 2**20) < 1e-9


def test_suppress_stdout(capsys):
    with hf.suppress_stdout():
        print("hidden")
    print("visible")
    out = capsys.readouterr().out
    assert "hidden" not in out and "visible" in out


def test_dir_ops(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    (src / "f.txt").write_text("x")
    hf.copy_dir(str(src), str(tmp_path / "dst"))
    assert (tmp_path / "dst" / "f.txt").is_file()
    hf.delete_dir_con(str(src))
    assert not src.exists()


def test_run_logger(tmp_path):
    log = hf.RunLogger(str(tmp_path), also_print=False)
    log("hello", 42)
    content = open(log.path).read()
    assert "hello 42" in content


def test_prefetcher_stop(synthetic_task, tmp_path):
    from lifelong_nnunet_tpu.planning.fingerprint import analyze_dataset
    from lifelong_nnunet_tpu.planning.plans import plan_experiment
    from lifelong_nnunet_tpu.planning.preprocess import preprocess_task
    from lifelong_nnunet_tpu.data.dataset import PreprocessedDataset
    from lifelong_nnunet_tpu.data.sampler import PatchSampler
    from lifelong_nnunet_tpu.data.pipeline import Prefetcher
    plans = plan_experiment(analyze_dataset(synthetic_task))
    stage = preprocess_task(synthetic_task, plans, str(tmp_path),
                            configs=("3d_fullres",))["3d_fullres"]
    ds = PreprocessedDataset(stage)
    pf = Prefetcher(PatchSampler(ds, ds.cases, (16, 16, 16), 2, seed=0))
    batch, keys = pf.next()
    assert batch["data"].shape[0] == 2 and len(keys) == 2
    pf.stop()
    pf.thread.join(timeout=5)
    assert not pf.thread.is_alive()
