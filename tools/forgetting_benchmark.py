"""Catastrophic-forgetting benchmark on structurally divergent synthetic tasks.

The reference's raison d'être is that CL methods SEPARATE on real domain
shifts (three-anatomy benchmark, /root/reference/README.md:71-75).  The MSD
data isn't in this environment, and intensity-shift/class-swap synthetic
tasks cannot induce forgetting (RESULTS.md round 3: the multi-head partition
absorbs label-semantics shift; per-image z-scoring erases intensity shift).
This benchmark uses STRUCTURALLY divergent tasks whose discriminative cues
actively conflict in the shared body (VERDICT r3 next #3):

  A 'blobs'      bright compact ellipsoid + brighter core = classes 1/2
  B 'shells'     thin hollow surfaces = classes; bright compact blobs are
                 explicit BACKGROUND distractors
  C 'dark_multi' multiple small HYPOintense components = classes; bright
                 compact blobs again BACKGROUND — the polarity inverse of A

Protocol: train A->B->C per method, snapshot the checkpoint after each task,
evaluate every snapshot on every task's val split (Evaluator), build the
[stage x task] Dice matrix, report BWT/FWT (evaluation/cl_metrics.py).
Acceptance: Sequential forgets task A (A[2,0] - A[0,0] <= -0.15) and the CL
methods (EWC / Rehearsal / LwF / MiB / PLOP) measurably mitigate.

  python tools/forgetting_benchmark.py                 # full method matrix
  python tools/forgetting_benchmark.py --methods sequential ewc
  python tools/forgetting_benchmark.py --epochs 4 --iters 50 --cases 12
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")  # silence AOT-loader spam

TASKS = [
    ("Task090_Blobs", "blobs", 0),
    ("Task091_Shells", "shells", 1),
    ("Task092_DarkMulti", "dark_multi", 2),
]


def build_tasks(root: str, cases: int):
    from tests.synthetic import make_synthetic_task
    dirs = {}
    for name, style, seed in TASKS:
        dirs[name] = make_synthetic_task(root, task_name=name,
                                         num_cases=cases, seed=seed,
                                         style=style)
    return dirs


def preprocess(task_dirs: dict, pre_root: str):
    from lifelong_nnunet_tpu.planning.fingerprint import analyze_dataset
    from lifelong_nnunet_tpu.planning.plans import plan_experiment
    from lifelong_nnunet_tpu.planning.preprocess import preprocess_task
    # first-task geometry invariant: plans come from task A alone
    plans = plan_experiment(analyze_dataset(task_dirs[TASKS[0][0]]))
    stages = {}
    for name in task_dirs:
        stages[name] = preprocess_task(task_dirs[name], plans, pre_root,
                                       configs=("3d_fullres",))["3d_fullres"]
    return plans, stages


def make_trainer(method: str, plans, out_dir: str, opts):
    from lifelong_nnunet_tpu.training.trainers import TRAINER_MAP
    cls = TRAINER_MAP[method]
    kw = {}
    if method == "ewc":
        kw["ewc_lambda"] = 0.4
    if method == "rehearsal":
        kw["samples_in_perc"] = 0.5
    return cls(plans, "3d_fullres", out_dir, opts, **kw)


def run_method(method: str, plans, stages: dict, root: str, opts) -> dict:
    from lifelong_nnunet_tpu.evaluation.cl_metrics import (accuracy_matrix,
                                                           cl_report)
    tasks = list(stages)
    tr = make_trainer(method, plans, os.path.join(root, method, "t0"), opts)
    ckpts = []
    t0 = time.time()
    for i, t in enumerate(tasks):
        out = os.path.join(root, method, f"t{i}")
        tr.set_output_folder(out)
        tr.train_task(t, stages[t])
        ckpts.append(os.path.join(out, "model_final_checkpoint"))
    train_s = time.time() - t0
    A = accuracy_matrix(ckpts, stages, opts)
    rep = cl_report(A, tasks)
    rep["method"] = method
    rep["train_seconds"] = round(train_s, 1)
    rep["taskA_drop"] = float(A[-1, 0] - A[0, 0])
    return rep


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--methods", nargs="*",
                    default=["sequential", "ewc", "rehearsal", "lwf", "mib",
                             "plop"])
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--cases", type=int, default=12)
    ap.add_argument("--base_features", type=int, default=8)
    ap.add_argument("--max_features", type=int, default=32)
    ap.add_argument("--patch", type=int, nargs=3, default=[16, 16, 16])
    ap.add_argument("--out", default="results/r4/forgetting.json")
    ap.add_argument("--keep_root", default=None,
                    help="work dir (default: fresh temp dir)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from lifelong_nnunet_tpu.training.trainer import TrainerOptions
    opts = TrainerOptions(
        num_epochs=args.epochs, iters_per_epoch=args.iters, val_iters=4,
        save_every=100, batch_size=2, patch_size=tuple(args.patch),
        augment=False, use_progress_val=False, dtype="float32",
        base_num_features=args.base_features,
        max_num_features=args.max_features)

    root = args.keep_root or tempfile.mkdtemp(prefix="forgetting_")
    raw = os.path.join(root, "raw")
    os.makedirs(raw, exist_ok=True)
    task_dirs = build_tasks(raw, args.cases)
    plans, stages = preprocess(task_dirs, os.path.join(root, "pre"))
    print(f"work dir {root}; tasks {list(stages)}", flush=True)

    reports = []
    for method in args.methods:
        print(f"=== {method} ===", flush=True)
        try:
            rep = run_method(method, plans, stages, root, opts)
        except Exception as e:  # keep the matrix going
            print(f"{method} FAILED: {type(e).__name__}: {e}", flush=True)
            reports.append({"method": method, "error": f"{type(e).__name__}: {e}"})
            continue
        A = np.array(rep["accuracy_matrix"])
        with np.printoptions(precision=3, suppress=True):
            print(A, flush=True)
        print(f"{method}: BWT {rep['BWT']:+.3f}  FWT {rep['FWT']:+.3f}  "
              f"final-mean {rep['final_mean_dice']:.3f}  "
              f"taskA drop {rep['taskA_drop']:+.3f}  "
              f"({rep['train_seconds']}s)", flush=True)
        reports.append(rep)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"tasks": [t[0] for t in TASKS],
                   "config": vars(args), "reports": reports}, f, indent=2)
    print(f"wrote {args.out}", flush=True)

    # summary table (markdown)
    print("\n| method | Dice A after A | A after C | taskA drop | BWT | FWT | final mean |")
    print("|---|---|---|---|---|---|---|")
    for r in reports:
        if "error" in r:
            print(f"| {r['method']} | ERROR {r['error'][:60]} |")
            continue
        A = np.array(r["accuracy_matrix"])
        print(f"| {r['method']} | {A[0, 0]:.3f} | {A[-1, 0]:.3f} "
              f"| {r['taskA_drop']:+.3f} | {r['BWT']:+.3f} | {r['FWT']:+.3f} "
              f"| {r['final_mean_dice']:.3f} |")


if __name__ == "__main__":
    main()
